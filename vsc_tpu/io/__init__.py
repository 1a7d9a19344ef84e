"""Host-side media and image I/O (native vscmedia engine + cv2 fallback)."""

from vsc_tpu.io.probe import (
    estimate_frame_count,
    get_video_duration,
    get_video_framerate,
    parse_framerate,
    probe_video,
)

__all__ = [
    "estimate_frame_count",
    "get_video_duration",
    "get_video_framerate",
    "parse_framerate",
    "probe_video",
]
