"""Artifact save/load (SURVEY.md S8 — the reference's pickle/torch asset
writers: 1st Place/src/process_data.py:319-322,436-444; 2nd Place/src/
preprocess.py:155-163). The link state (automaton + dictionary + embedding
matrix) persists as a single versioned pickle next to the checkpoints, so
a resumed run skips the build; numpy arrays round-trip losslessly."""

from __future__ import annotations

import os
import pickle

ARTIFACT_VERSION = 1


def save_state(state: dict, path: str) -> None:
    tmp = path + f".tmp{os.getpid()}"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(tmp, "wb") as f:
        pickle.dump({"version": ARTIFACT_VERSION, "state": state}, f, protocol=5)
    os.replace(tmp, path)


def load_state(path: str) -> dict | None:
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        blob = pickle.load(f)
    if blob.get("version") != ARTIFACT_VERSION:
        return None
    return blob["state"]
