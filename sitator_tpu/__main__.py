"""``python -m sitator_tpu`` — see :mod:`sitator_tpu.cli`."""
import sys

from sitator_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main())
