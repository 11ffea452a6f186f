"""`python -m pysdr_tpu` — the main application entry point
(reference pySDR.py:210-268 `__main__`)."""

import sys

from pysdr_tpu.app import main

if __name__ == "__main__":
    sys.exit(main())
