"""Write train/val/test json file lists for the unselfsupervised experiments.

Functional parity with reference:
projects/unselfsupervised/generate_dataset_json.py — keeps "transversal"
files, assigns the published subject splits (val p9/p19, test p8/p10/p13, or
their UUID aliases), dumps three json lists consumable by the loaders'
``data_path=*.json`` mode.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

VAL_KEYS = ("p9", "p19", "dd969854-ec56-4ccc-b7ac-ff4cd7735095", "d089cbe0-48b3-4ae2-9475-53ca89ee90fe")
TEST_KEYS = (
    "p8", "p10", "p13",
    "ec00945c-ad90-46b7-8c38-a69e9e801074",
    "efa383b6-9446-438a-9901-1fe951653dbd",
    "ee2efe48-1e9d-480e-9364-e53db01532d4",
)


def split_files(filenames, orientation: str = "transversal"):
    files = [f for f in filenames if orientation in Path(f).name]

    def has(f, keys):
        name = Path(f).name
        return any(k in name for k in keys)

    val = [str(f) for f in files if has(f, VAL_KEYS)]
    test = [str(f) for f in files if has(f, TEST_KEYS)]
    train = [str(f) for f in files if str(f) not in val and str(f) not in test]
    return train, val, test


def main(data_paths, output_path: Path, orientation: str = "transversal"):
    filenames = []
    for d in data_paths:
        filenames += sorted(Path(d).iterdir())
    train, val, test = split_files(filenames, orientation)
    output_path.mkdir(parents=True, exist_ok=True)
    for name, fold in (("train", train), ("val", val), ("test", test)):
        with open(output_path / f"{name}.json", "w", encoding="utf-8") as f:
            json.dump(fold, f)
    return train, val, test


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", type=Path, action="append", required=True,
                   help="Data directory (repeatable).")
    p.add_argument("--output_path", type=Path, default=Path("data/folds"))
    p.add_argument("--orientation", default="transversal")
    a = p.parse_args()
    main(a.data_path, a.output_path, a.orientation)
