"""TPU-native ops: CTC loss, CTC decoders."""

from speecht_tpu.ops.ctc import ctc_loss
from speecht_tpu.ops.decode import greedy_decode

__all__ = ["ctc_loss", "greedy_decode"]
