#!/usr/bin/env python
"""Root-level evaluation CLI, mirroring the reference's `python test.py
--mode K` interface. See mp_hsir_tpu/cli/test_cli.py."""

from mp_hsir_tpu.cli.test_cli import main

if __name__ == "__main__":
    main()
