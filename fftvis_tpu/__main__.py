"""``python -m fftvis_tpu`` entry point (same CLI as the console script)."""

from .cli import main

if __name__ == "__main__":
    raise SystemExit(main())
