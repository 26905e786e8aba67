"""Model zoo: Wav2Letter acoustic model (flax)."""

from speecht_tpu.models.wav2letter import Wav2Letter, Wav2LetterConfig

__all__ = ["Wav2Letter", "Wav2LetterConfig"]
