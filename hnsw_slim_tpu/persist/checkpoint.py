"""Index persistence: the index files ARE the checkpoints.

Reference: versionless writeBinaryPOD streams (hnswalg_slim.h saveIndex
:717-751, loadIndex :753-815). Here: one .npz of arrays + a JSON metadata
header (versioned), with derived state rebuilt on load.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ..config import SearchConfig
from ..graph.types import ChalGraph, LevelGraph

FORMAT_VERSION = 1


def save_slim(path: str | Path, index) -> None:
    """Save an HnswSlim(Zero)Index (graph + vectors + metadata)."""
    g = index.graph
    meta = dict(
        version=FORMAT_VERSION,
        kind=type(index).__name__,
        metric=index.metric,
        max_level=g.max_level,
        threshold_level=g.threshold_level,
        cap0=g.cap0,
        cap=g.cap,
        entry=int(np.asarray(g.entry)),
    )
    np.savez(
        path,
        meta=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
        nbr=np.asarray(g.nbr),
        lvl_off=np.asarray(g.lvl_off),
        level=np.asarray(g.level),
        vectors=np.asarray(index.vectors),
    )


def load_slim(path: str | Path, search_cfg: SearchConfig | None = None):
    """Load an HnswSlim(Zero)Index; visited pools etc. are rebuilt lazily
    (mirrors loadIndex's derived-state reconstruction)."""
    from ..index.slim import HnswSlimIndex
    from ..index.slimzero import HnswSlimZeroIndex
    from ..ops import distance

    with np.load(path) as z:
        meta = json.loads(bytes(z["meta"].tobytes()).decode())
        if meta["version"] > FORMAT_VERSION:
            raise ValueError(f"unsupported index version {meta['version']}")
        cls = {"HnswSlimIndex": HnswSlimIndex,
               "HnswSlimZeroIndex": HnswSlimZeroIndex}[meta["kind"]]
        idx = cls(metric=meta["metric"], search_cfg=search_cfg)
        idx.graph = ChalGraph(
            nbr=jnp.asarray(z["nbr"]),
            lvl_off=jnp.asarray(z["lvl_off"]),
            level=jnp.asarray(z["level"]),
            entry=jnp.asarray(np.int32(meta["entry"])),
            max_level=meta["max_level"],
            threshold_level=meta["threshold_level"],
            cap0=meta["cap0"],
            cap=meta["cap"],
        )
        idx.vectors = jnp.asarray(z["vectors"])
        idx.vn = distance.sq_norms(idx.vectors)
    return idx


def save_hnsw(path: str | Path, index) -> None:
    g = index.graph
    meta = dict(
        version=FORMAT_VERSION,
        kind="HnswIndex",
        metric=index.cfg.metric,
        max_level=g.max_level,
        entry=int(np.asarray(g.entry)),
        cfg=dataclasses.asdict(index.cfg),
    )
    arrays = {f"adj{l}": np.asarray(a) for l, a in enumerate(g.adjs)}
    np.savez(
        path,
        meta=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
        level=np.asarray(g.level),
        vectors=np.asarray(index.vectors),
        **arrays,
    )


def load_hnsw(path: str | Path):
    from ..config import HnswConfig
    from ..index.hnsw import HnswIndex
    from ..ops import distance

    with np.load(path) as z:
        meta = json.loads(bytes(z["meta"].tobytes()).decode())
        cfg = HnswConfig(**meta["cfg"])
        idx = HnswIndex(cfg)
        adjs = tuple(
            jnp.asarray(z[f"adj{l}"]) for l in range(meta["max_level"] + 1)
        )
        idx.graph = LevelGraph(
            adjs=adjs,
            level=jnp.asarray(z["level"]),
            entry=jnp.asarray(np.int32(meta["entry"])),
            max_level=meta["max_level"],
        )
        idx.levels = np.asarray(z["level"])
        idx.vectors = jnp.asarray(z["vectors"])
        idx.vn = distance.sq_norms(idx.vectors)
    return idx
