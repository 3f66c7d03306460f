"""Atlas checkpoint save/load.

Role of `System::SaveAtlas/LoadAtlas` (`/root/reference/src/System.cc:
1403-1546`): serialize the full multi-map Atlas with a vocabulary checksum
guard. The reference needs 1500 lines of boost::serialization pointer
swizzling (`KeyFrame::PreSave/PostLoad`, SerializationUtils.h); the SoA
MapState is already checkpoint-shaped — one compressed npz of arrays plus
counters, with a sha256 of the vocabulary tensors (the MD5-of-vocab-file
guard, System.cc:1508-1546).
"""

from __future__ import annotations

import dataclasses
import hashlib

import jax.numpy as jnp
import numpy as np

from ..atlas.state import MapState
from ..place.vocab import Vocabulary


def vocab_checksum(voc: Vocabulary | None) -> str:
    if voc is None:
        return "none"
    h = hashlib.sha256()
    h.update(np.array(voc.centers).tobytes())
    h.update(np.array(voc.weights).tobytes())
    h.update(f"{voc.branching}:{voc.depth}".encode())
    return h.hexdigest()


def save_atlas(path: str, s: MapState, voc: Vocabulary | None = None,
               extra: dict | None = None) -> None:
    arrays = {
        f.name: np.array(getattr(s, f.name)) for f in dataclasses.fields(s)
    }
    arrays["__voc_checksum"] = np.frombuffer(
        vocab_checksum(voc).encode(), dtype=np.uint8
    )
    if extra:
        for k, v in extra.items():
            arrays[f"__extra_{k}"] = np.asarray(v)
    np.savez_compressed(path, **arrays)


def load_atlas(path: str, voc: Vocabulary | None = None,
               check_vocab: bool = True) -> tuple[MapState, dict]:
    data = np.load(path)
    stored = bytes(data["__voc_checksum"]).decode()
    if check_vocab and stored != vocab_checksum(voc):
        raise ValueError(
            f"vocabulary checksum mismatch: atlas was built with {stored[:12]}..., "
            f"current vocabulary is {vocab_checksum(voc)[:12]}..."
        )
    fields = {f.name for f in dataclasses.fields(MapState)}
    kwargs = {k: jnp.asarray(v) for k, v in data.items() if k in fields}
    extra = {
        k[len("__extra_"):]: data[k]
        for k in data.files
        if k.startswith("__extra_")
    }
    return MapState(**kwargs), extra
