"""Configuration subsystem: schema, validation, persistence, path resolution."""

from vsc_tpu.config.manager import (
    CONFIG_SCHEMA,
    ConfigError,
    create_default_config,
    find_valid_frames,
    get_frame_paths,
    get_path,
    load_config,
    merge_cli_args,
    save_config,
    update_stereo_params,
    validate_config,
)
from vsc_tpu.config.stereo_params import StereoParams

__all__ = [
    "CONFIG_SCHEMA",
    "ConfigError",
    "StereoParams",
    "create_default_config",
    "find_valid_frames",
    "get_frame_paths",
    "get_path",
    "load_config",
    "merge_cli_args",
    "save_config",
    "update_stereo_params",
    "validate_config",
]
