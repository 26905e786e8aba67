"""Live recording executor: microphone -> features -> decode -> print.

Capability parity with the reference record command (reference:
speecht/recording.py:27-69): batch-of-one input path with manual
``--input-size`` (no cache probe), 16 kHz recorder with 4096-sample chunks,
per-utterance feature extraction on the host, decode (greedy or LM beam),
printed transcription, infinite loop.

TPU-native additions: ``--streaming`` incremental transcription and
``--audio-source FILE...`` — a file-backed recorder with the mic
recorder's exact interface and post chain, so the full record composition
(capture -> features -> single_batch -> decode -> print) runs end-to-end
in tests and on hardware without a microphone; the executor returns the
printed transcripts for assertion.
"""

from __future__ import annotations

import numpy as np

from speecht_tpu import vocabulary
from speecht_tpu.data import features as F
from speecht_tpu.data.pipeline import single_batch
from speecht_tpu.execution import build_model, init_state
from speecht_tpu.train import step as tstep
from speecht_tpu.train.checkpoint import CheckpointManager


class Recording:
    def __init__(self, flags, recorder=None):
        self.flags = flags
        # injection seam: tests and `--audio-source` substitute a
        # file-backed recorder for the microphone
        self._recorder = recorder

    def _make_recorder(self, sample_rate: int, chunk_size: int):
        if self._recorder is not None:
            return self._recorder
        sources = getattr(self.flags, "audio_source", None)
        if sources:
            from speecht_tpu.record_utils import FileAudioSource

            return FileAudioSource(
                sources, rate=sample_rate, chunk_size=chunk_size
            )
        from speecht_tpu.record_utils import AudioRecorder

        return AudioRecorder(rate=sample_rate, chunk_size=chunk_size)

    def _make_decoder(self, model):
        lm_flags = getattr(self.flags, "lm", None)
        if lm_flags is not None and lm_flags.language_model:
            from speecht_tpu.ops.beam import BeamSearchDecoder

            return BeamSearchDecoder(model, lm_flags).eval_step
        return tstep.make_eval_step(model)

    def run(self):
        from speecht_tpu.record_utils import AudioSourceExhausted

        flags = self.flags
        sample_rate = 16000
        # checkpoints are trained on cache-rate features (22050 — the
        # reference pipeline resamples every corpus file there,
        # preprocessing.py:169's librosa.load); the mic captures at
        # 16 kHz, so captured audio is resampled to the feature rate
        # before the front end — the reference feeds 16 kHz audio
        # straight in (recording.py:34,57-58), a train/record feature
        # mismatch this executor fixes. `--feature-rate 16000`
        # reproduces the reference behavior.
        feature_rate = getattr(flags, "feature_rate", 22050)
        recorder = self._make_recorder(sample_rate, chunk_size=4 * 1024)

        model = build_model(flags.input_size, flags)
        state, _tx = init_state(model, flags)
        ckpt = CheckpointManager(flags.run_train_dir)
        state = ckpt.restore(state)

        if getattr(flags, "streaming", False):
            return self._run_streaming(
                model, state, recorder, sample_rate, feature_rate
            )

        decoder = self._make_decoder(model)

        transcripts = []
        while True:
            print("Recording audio")
            try:
                raw_audio, _width = recorder.record()
            except AudioSourceExhausted:
                # file-backed sources end; the mic loop is infinite
                # (reference recording.py:38's `while True`)
                return transcripts
            raw_audio = np.asarray(raw_audio)
            if feature_rate != sample_rate:
                from speecht_tpu import native

                raw_audio = native.resample(
                    raw_audio, sample_rate, feature_rate
                )

            print("Generate MFCCs or power spectrogram")
            if flags.feature_type == "power":
                speech_input = F.calc_power_spectrogram(
                    raw_audio, feature_rate
                )
            elif flags.feature_type == "mfcc":
                speech_input = F.calc_mfccs(raw_audio, feature_rate)
            else:
                raise NotImplementedError(
                    "Only power and mfccs are supported for input types."
                )

            print("Running speech recognition")
            batch = single_batch(speech_input)
            _loss, decoded, dec_lengths = decoder(state.params, batch)
            decoded = np.asarray(decoded)
            dec_lengths = np.asarray(dec_lengths)
            decoded_str = vocabulary.ids_to_sentence(
                decoded[0, : dec_lengths[0]]
            )
            print(f"decoded: {decoded_str}")
            transcripts.append(decoded_str)

    def _run_streaming(self, model, state, recorder, sample_rate,
                       feature_rate=None):
        """Low-latency mode: incremental transcription while audio arrives.

        Reads raw chunks straight off the microphone stream (no silence
        gate) and refreshes the partial transcript after each chunk. When
        ``feature_rate`` differs from the capture rate, chunks pass
        through a sample-exact streaming resampler (ops/resample.py
        StreamResampler) so the recognizer sees cache-rate audio.
        """
        from speecht_tpu.ops.streaming import StreamingRecognizer
        from speecht_tpu.record_utils import AudioSourceExhausted

        feature_rate = feature_rate or sample_rate
        resampler = None
        if feature_rate != sample_rate:
            from speecht_tpu.ops.resample import StreamResampler

            resampler = StreamResampler(sample_rate, feature_rate)
        rec = StreamingRecognizer(
            model,
            state.params,
            sample_rate=feature_rate,
            feature_type=self.flags.feature_type,
        )
        # with --language-model the PARTIALS are LM-fused too (a narrow
        # continuation beam over the tentative tail; committed text stays
        # frozen) and the final transcript is decoded through the full
        # beam — the streaming twin of the reference record's LM decode
        # (reference recording.py:50-69, speech_model.py:101-111)
        beam = None
        lm_flags = getattr(self.flags, "lm", None)
        if lm_flags is not None and lm_flags.language_model:
            from speecht_tpu.ops.beam import BeamSearchDecoder

            beam = BeamSearchDecoder(model, lm_flags)
        with recorder.open_input_stream() as read_chunk:
            print("Streaming transcription (ctrl-c to stop)")
            try:
                while True:
                    chunk = read_chunk()
                    if resampler is not None:
                        chunk = resampler.process(chunk)
                    partial = rec.accept_chunk(chunk)
                    if beam is not None and beam.lm is not None:
                        partial = rec.partial_text_fused(
                            beam.lm,
                            lm_weight=beam.lm_config.lm_weight,
                            word_count_weight=(
                                beam.lm_config.word_count_weight
                            ),
                            valid_word_count_weight=(
                                beam.lm_config.valid_word_count_weight
                            ),
                        )
                    print(f"\rpartial: {partial}", end="", flush=True)
            except (KeyboardInterrupt, AudioSourceExhausted):
                # ctrl-c on a mic, end-of-audio on a file source
                print()
                if resampler is not None:
                    rec.accept_chunk(resampler.flush())
                final = rec.finalize(beam=beam)
                print(f"decoded: {final}")
                return final
