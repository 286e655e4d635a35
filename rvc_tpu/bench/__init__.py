from .parity import mel_distance_db, compare_wavs  # noqa: F401
