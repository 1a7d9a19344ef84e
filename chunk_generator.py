#!/usr/bin/env python3
"""Public CLI entry point — delegates to vsc_tpu.pipeline.chunk_generator.
Same invocation surface as the reference script of the same name."""
import sys
from vsc_tpu.utils.console import ensure_utf8_console, set_terminal_title

if __name__ == "__main__":
    ensure_utf8_console()
    set_terminal_title("chunk_generator.py " + " ".join(sys.argv[1:]))
    from vsc_tpu.pipeline.chunk_generator import main
    sys.exit(main())
