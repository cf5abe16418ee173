"""``python -m green_marl_tpu.cli.run <app> [options] <graph> [out]``."""

import sys

from .apps import main

if __name__ == "__main__":
    sys.exit(main())
