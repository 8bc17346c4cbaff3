#!/usr/bin/env python3
"""Top-level training entry point (same CLI shape as the reference driver):

    python3 train.py <dataset> <params.prms | checkpoint.pkl> [redirect]
"""

from theanet_tpu.train import main

if __name__ == "__main__":
    main()
