"""Shared utilities: frame numbering, console handling."""

from vsc_tpu.utils.frame_utils import (
    chunk_name,
    depth_name,
    extract_frame_number,
    frame_name,
    sbs_name,
)
from vsc_tpu.utils.console import ensure_utf8_console, set_terminal_title, suppress_cv2_logging

__all__ = [
    "chunk_name",
    "depth_name",
    "ensure_utf8_console",
    "extract_frame_number",
    "frame_name",
    "sbs_name",
    "set_terminal_title",
    "suppress_cv2_logging",
]
