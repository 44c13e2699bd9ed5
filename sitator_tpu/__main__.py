"""``python -m sitator_tpu`` — see :mod:`sitator_tpu.cli`."""
import sys

from sitator_tpu.cli import main

sys.exit(main())
