"""Checkpoint / resume (SURVEY.md §5).

In the reference, the ``.npy`` file *is* the checkpoint and resume means
reloading + inserting more strings (ref: src/lib.rs:30-43, test
src/dynamic_bwt.rs:734-773 — where load is an O(n) one-symbol-at-a-time
reinsert). Here:

* the same ``.npy`` remains the portable checkpoint (byte-compatible);
* ``save_index_cache``/``load_index_cache`` additionally persist the decoded
  device index (occ tables + C array) so a query service restarts without
  re-deriving anything;
* ``save_sharded``/``load_sharded`` split one BWT into per-shard npy files
  plus a manifest, so each host of a pod loads only its slice (each shard
  file is itself a valid ``comp_msbwt.npy`` of its contiguous BWT slice).
"""

from __future__ import annotations

import json
import os

import numpy as np

from rust_msbwt_tpu.ops.alphabet import VC_LEN
from rust_msbwt_tpu.ops.rle import bytes_from_runs, decode_symbols, runs_from_symbols
from rust_msbwt_tpu.utils.npy import load_bwt_bytes, save_bwt_bytes


def save_index_cache(index, path: str) -> None:
    """Persist an ``ops.rank.OccIndex`` (npz sidecar next to the npy)."""
    np.savez_compressed(
        path,
        bwt=np.asarray(index.bwt),
        occ=np.asarray(index.occ),
        starts=np.asarray(index.starts),
        n=np.int64(index.n),
    )


def load_index_cache(path: str):
    import jax.numpy as jnp

    from rust_msbwt_tpu.ops.rank import OccIndex

    with np.load(path) as z:
        return OccIndex(
            bwt=jnp.asarray(z["bwt"]),
            occ=jnp.asarray(z["occ"]),
            starts=jnp.asarray(z["starts"]),
            n=int(z["n"]),
        )


def save_sharded(decoded: np.ndarray, directory: str, n_shards: int) -> None:
    """Split a decoded BWT into ``n_shards`` contiguous slices, each saved as
    a standalone ``comp_msbwt.npy``, plus ``manifest.json`` with boundaries
    and global symbol totals.

    >>> import numpy as np, tempfile
    >>> d = np.array([5, 0, 1, 2, 3, 4], np.uint8)
    >>> with tempfile.TemporaryDirectory() as td:
    ...     save_sharded(d, td, n_shards=2)
    ...     m = load_manifest(td)
    ...     ok = np.array_equal(load_sharded(td), d)
    >>> (m["n_shards"], m["total_size"], ok)
    (2, 6, True)
    """
    decoded = np.asarray(decoded, dtype=np.uint8)
    os.makedirs(directory, exist_ok=True)
    n = int(decoded.size)
    bounds = [round(i * n / n_shards) for i in range(n_shards + 1)]
    for d in range(n_shards):
        sl = decoded[bounds[d] : bounds[d + 1]]
        syms, counts = runs_from_symbols(sl)
        save_bwt_bytes(bytes_from_runs(syms, counts), _shard_path(directory, d))
    totals = np.bincount(decoded, minlength=VC_LEN)[:VC_LEN]
    manifest = {
        "format": "rust_msbwt_tpu.sharded_bwt.v1",
        "n_shards": n_shards,
        "total_size": n,
        "boundaries": bounds,
        "symbol_counts": totals.tolist(),
    }
    with open(os.path.join(directory, "manifest.json"), "w") as fp:
        json.dump(manifest, fp, indent=1)


def load_manifest(directory: str) -> dict:
    with open(os.path.join(directory, "manifest.json")) as fp:
        return json.load(fp)


def load_shard(directory: str, shard: int) -> np.ndarray:
    """Decoded symbols of one shard (what a single host needs)."""
    return decode_symbols(load_bwt_bytes(_shard_path(directory, shard)))


def load_sharded(directory: str) -> np.ndarray:
    """Reassemble the full decoded BWT from a sharded checkpoint."""
    m = load_manifest(directory)
    parts = [load_shard(directory, d) for d in range(m["n_shards"])]
    out = np.concatenate(parts) if parts else np.zeros(0, np.uint8)
    if out.size != m["total_size"]:
        raise IOError(
            f"sharded checkpoint corrupt: {out.size} != {m['total_size']}"
        )
    return out


def _shard_path(directory: str, d: int) -> str:
    return os.path.join(directory, f"shard_{d:05d}.npy")
