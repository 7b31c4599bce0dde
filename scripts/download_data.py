#!/usr/bin/env python
"""Dataset fetch (reference scripts/download_data.py): downloads the three
released dataset zips (ABC-NEF_Edge, DTU_Edge, Replica_Edge) from Google
Drive into ./data and unpacks them. Requires network access and gdown."""

from __future__ import annotations

import os
import zipfile

DATASETS = {
    # Google Drive file ids of the released dataset archives
    # (reference scripts/download_data.py:30-34)
    "dataset_0.zip": "17aUcCJCP5vgARs237H0BtlRoms5-CR6e",
    "dataset_1.zip": "1eZZiMcTfoiYfIxtv4Wy3lQYAudZpKlE0",
    "dataset_2.zip": "1pum-25MEFhXQu1fZLy_f9lRMBxvF1ssm",
}


def main(out_dir: str = "./data") -> None:
    try:
        import gdown
    except ImportError:
        raise SystemExit(
            "gdown is not installed (this environment has no network egress);"
            " fetch the dataset zips on a connected machine and unpack them"
            f" under {out_dir}/."
        )
    os.makedirs(out_dir, exist_ok=True)
    for name, file_id in DATASETS.items():
        target = os.path.join(out_dir, name)
        if not os.path.exists(target):
            gdown.download(id=file_id, output=target, quiet=False)
        with zipfile.ZipFile(target) as zf:
            zf.extractall(out_dir)
        os.remove(target)


if __name__ == "__main__":
    main()
