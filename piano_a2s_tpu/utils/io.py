"""Extension-dispatched load/save (reference: utilities.py:27-58,203-226)."""

from __future__ import annotations

import json
import os
import pickle
from typing import Any, List, Union

import numpy as np


def load(path: str) -> Any:
    if path.endswith(".npy"):
        return np.load(path)
    if path.endswith(".json"):
        with open(path) as f:
            return json.load(f)
    if path.endswith((".yaml", ".yml")):
        import yaml
        with open(path) as f:
            return yaml.safe_load(f)
    if path.endswith(".csv"):
        import csv
        with open(path) as f:
            return list(csv.reader(f))
    if path.endswith(".pkl"):
        with open(path, "rb") as f:
            return pickle.load(f)
    if path.endswith(".txt"):
        with open(path) as f:
            return [line.strip() for line in f]
    raise ValueError(f"unsupported extension: {path}")


def save(data: Any, path: str) -> None:
    if path.endswith(".npy"):
        np.save(path, np.asarray(data))
    elif path.endswith(".json"):
        with open(path, "w") as f:
            json.dump(data, f, indent=2)
    elif path.endswith(".pkl"):
        with open(path, "wb") as f:
            pickle.dump(data, f)
    elif path.endswith((".yaml", ".yml")):
        import yaml
        with open(path, "w") as f:
            yaml.safe_dump(data, f)
    elif path.endswith(".txt"):
        with open(path, "w") as f:
            if isinstance(data, str):
                f.write(data)
            else:
                f.writelines(str(x) + "\n" for x in data)
    else:
        raise ValueError(f"unsupported extension: {path}")


def mkdirs(paths: Union[str, List[str]]) -> None:
    if isinstance(paths, str):
        paths = [paths]
    for p in paths:
        os.makedirs(p, exist_ok=True)
