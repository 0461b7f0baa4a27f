from .audio import crop_pad_audio, load_wav, parse_audio_length  # noqa: F401
