from qasr.configs.config import (
    Config,
    DataConfig,
    DecodeConfig,
    MeshConfig,
    ModelConfig,
    TrainConfig,
    PRESETS,
    get_config,
)

__all__ = [
    "Config",
    "DataConfig",
    "DecodeConfig",
    "MeshConfig",
    "ModelConfig",
    "TrainConfig",
    "PRESETS",
    "get_config",
]
