"""speechT-TPU: a TPU-native (JAX/XLA/Pallas) speech-to-text framework.

A from-scratch rebuild of the capability surface of louiskirsch/speechT
(Wav2Letter + CTC on LibriSpeech) designed TPU-first:

- features on-device: framing -> rFFT -> mel filterbank (MXU matmul) -> log
- Wav2Letter conv stack as XLA ``conv_general_dilated`` in bfloat16
- CTC loss as a log-space alpha-beta recursion (pure XLA scan and a Pallas
  TPU kernel), custom VJP
- greedy + beam-search CTC decoding (device lattice + host C++ LM scorer)
- data/model parallel training via ``jax.sharding.Mesh`` + jit shardings
- orbax checkpointing, TensorBoard-compatible metrics

Reference capability map: see SURVEY.md at the repo root; each module's
docstring cites the reference file:line it provides parity with.
"""

__version__ = "0.1.0"
