#!/usr/bin/env python3
"""Public CLI entry point — delegates to vsc_tpu.pipeline.stream_convert.
TPU-native streaming fast path (no PNG intermediates); the step-by-step
CLIs remain the reference-compatible route."""
import sys
from vsc_tpu.utils.console import ensure_utf8_console, set_terminal_title

if __name__ == "__main__":
    ensure_utf8_console()
    set_terminal_title("stream_convert.py " + " ".join(sys.argv[1:]))
    from vsc_tpu.pipeline.stream_convert import main
    sys.exit(main())
