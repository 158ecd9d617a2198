from whisper_tpu.audio.wav import read_wav, read_wav_legacy, write_wav, read_pcm_f32
from whisper_tpu.audio.vad import (
    frame_energies,
    energy_vad,
    remove_silence,
    speech_segments,
)

__all__ = [
    "read_wav",
    "read_wav_legacy",
    "write_wav",
    "read_pcm_f32",
    "frame_energies",
    "energy_vad",
    "remove_silence",
    "speech_segments",
]
