"""Preprocess executor: corpus download + offline feature cache.

Capability parity with the reference preprocess command (reference:
speecht/preprocessing.py:282-311): ensure corpus availability, pick the
feature extractor per ``--mfcc``/``--power``, store train/test/dev subsets
honoring the ``--*-only`` flags.
"""

from __future__ import annotations

from speecht_tpu.corpus import SpeechCorpusProvider
from speecht_tpu.data import features as F
from speecht_tpu.data.reader import SpeechCorpusReader


class Preprocessing:
    def __init__(self, flags):
        self.flags = flags

    def run(self):
        flags = self.flags
        corpus = SpeechCorpusProvider(flags.data_dir)
        corpus.ensure_availability()
        reader = SpeechCorpusReader(flags.data_dir)

        if flags.feature_type not in F.FEATURE_FUNCTIONS:
            raise ValueError("Feature type must be mfcc or power.")
        preprocess_fnc = F.FEATURE_FUNCTIONS[flags.feature_type]
        workers = getattr(flags, "num_workers", 0)
        on_device = bool(getattr(flags, "device_preprocess", False))
        if on_device:
            # batched TPU DSP (reader.store_samples_device); compilation
            # cache makes repeat bucket shapes start instantly
            from speecht_tpu import runtime

            runtime.enable_compilation_cache()

        def store(split: str):
            if on_device:
                reader.store_samples_device(
                    split,
                    flags.feature_type,
                    transfer_dtype=getattr(
                        flags, "transfer_dtype", "bfloat16"
                    ),
                )
            else:
                reader.store_samples(
                    split, preprocess_fnc, num_workers=workers
                )

        preprocess_all = not (
            flags.train_only or flags.test_only or flags.dev_only
        )

        if flags.train_only or preprocess_all:
            print("Preprocessing training data")
            store("train")

        if flags.test_only or preprocess_all:
            print("Preprocessing test data")
            store("test")

        if flags.dev_only or preprocess_all:
            print("Preprocessing development data")
            store("dev")
