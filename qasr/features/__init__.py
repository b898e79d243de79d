from qasr.features.frontend import (
    FrontendConfig,
    delta,
    featurize_waveform,
    frame_signal,
    log_mel_spectrogram,
    mel_filterbank,
    normalize_features,
    num_frames,
    quaternion_features,
)

__all__ = [
    "FrontendConfig",
    "delta",
    "featurize_waveform",
    "frame_signal",
    "log_mel_spectrogram",
    "mel_filterbank",
    "normalize_features",
    "num_frames",
    "quaternion_features",
]
