"""Synthesize a `best_run`-layout TF Saver checkpoint for gate rehearsal.

The reference publishes trained weights as a TF1 Saver checkpoint tarball
(reference README.md:75-86) extracted into ``train/best_run`` and evaluated
with ``evaluate --run-name best_run``. LibriSpeech and the released tarball
are unreachable from this environment (zero egress), so this tool creates a
checkpoint with the exact released layout (variable names
``convolution_layer_<i>/filters|bias``, ``speechT.ckpt-<step>`` files,
``checkpoint`` state file) and random weights — letting the full parity
gate (docs/parity_gate.md) be rehearsed end to end through the CLI.

Usage: python tools/make_best_run_fixture.py <out_dir> [input_size]
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np


def make_fixture(out_dir: str, input_size: int = 128, seed: int = 0):
    import tensorflow as tf

    from speecht_tpu.models.wav2letter import Wav2LetterConfig

    cfg = Wav2LetterConfig(input_size=input_size)
    rng = np.random.RandomState(seed)
    graph = tf.Graph()
    with graph.as_default():
        tf_vars = []
        cin = cfg.input_size
        for i, (width, _stride, cout, _relu) in enumerate(cfg.layer_specs):
            k = (rng.randn(width, cin, cout) * 0.02).astype(np.float32)
            b = np.zeros(cout, np.float32)
            tf_vars.append(
                tf.compat.v1.get_variable(
                    f"convolution_layer_{i}/filters", initializer=k
                )
            )
            tf_vars.append(
                tf.compat.v1.get_variable(
                    f"convolution_layer_{i}/bias", initializer=b
                )
            )
            cin = cout
        saver = tf.compat.v1.train.Saver(var_list=tf_vars)
        init = tf.compat.v1.global_variables_initializer()
    with tf.compat.v1.Session(graph=graph) as sess:
        sess.run(init)
        path = saver.save(
            sess, out_dir.rstrip("/") + "/speechT.ckpt", global_step=58000
        )
    return path


if __name__ == "__main__":
    if len(sys.argv) < 2:
        print(__doc__)
        raise SystemExit(1)
    import os

    os.makedirs(sys.argv[1], exist_ok=True)
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    print("wrote", make_fixture(sys.argv[1], size))
