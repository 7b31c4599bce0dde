#!/usr/bin/env python
"""Entry point; same CLI as the reference's main.py."""

from emap_tpu.cli import main

if __name__ == "__main__":
    main()
