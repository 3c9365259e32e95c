"""Sharding-aware checkpoint store (Orbax/TensorStore).

The role of the reference's `.tinq` format (quantization.cpp:120-333 —
single-file, single-host, full-tensor blobs) re-designed for the TPU
execution model, per SURVEY.md §5 "checkpoint/resume": a directory
checkpoint written by Orbax where

  - quantized QTensor leaves persist as their packed data + scales
    (+zero_points) arrays — no dequantization round trip;
  - SAVE is multi-host aware: each process writes only the shards it
    owns (Orbax/TensorStore handles coordination), so a pod-sharded
    model never gathers onto one host;
  - RESTORE can place every leaf directly onto a `Mesh` with the
    framework's PartitionSpecs — arrays materialize already sharded
    (no replicated-then-reshard memory spike); or restore unsharded
    for single-chip use.

TINQ (loader/tinq.py) remains the portable single-file interchange
format; this is the production store for sharded serving.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from turboinfer_tpu.config import ModelConfig
from turboinfer_tpu.core.qtensor import QEmbed, QTensor
from turboinfer_tpu.utils import logging as tlog

_MANIFEST = "turboinfer_manifest.json"
_QT_FIELDS = ("data", "scales", "zero_points")


def _split_qtensors(params):
    """QTensor leaves → plain dicts (orbax serializes plain pytrees);
    returns (plain_tree, qt_meta {path: {bits, group_size, shape}})."""
    meta: Dict[str, Any] = {}

    def walk(node, path):
        if isinstance(node, QTensor):
            meta["/".join(path)] = {"kind": "qtensor", "bits": node.bits,
                                    "group_size": node.group_size,
                                    "shape": list(node.shape)}
            out = {"data": node.data, "scales": node.scales}
            if node.zero_points is not None:
                out["zero_points"] = node.zero_points
            return out
        if isinstance(node, QEmbed):
            meta["/".join(path)] = {"kind": "qembed"}
            return {"data": node.data, "scales": node.scales}
        if isinstance(node, dict):
            return {k: walk(v, path + [k]) for k, v in node.items()}
        return node

    return walk(params, []), meta


def _join_qtensors(plain, meta):
    def walk(node, path):
        key = "/".join(path)
        if key in meta:
            m = meta[key]
            # "kind" absent in pre-QEmbed manifests -> qtensor
            if m.get("kind", "qtensor") == "qembed":
                return QEmbed(data=node["data"], scales=node["scales"])
            return QTensor(data=node["data"], scales=node["scales"],
                           zero_points=node.get("zero_points"),
                           bits=m["bits"], group_size=m["group_size"],
                           shape=tuple(m["shape"]))
        if isinstance(node, dict):
            return {k: walk(v, path + [k]) for k, v in node.items()}
        return node

    return walk(plain, [])


def save_checkpoint(path: str, params, config: ModelConfig,
                    metadata: Optional[Dict[str, Any]] = None) -> None:
    """Write a checkpoint directory: Orbax array store + JSON manifest
    (model config, quantization layout, user metadata)."""
    import orbax.checkpoint as ocp
    plain, qt_meta = _split_qtensors(params)
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.join(path, "params"), plain)
    cfg = dataclasses.asdict(config)
    cfg["dtype"] = jnp.dtype(config.dtype).name
    manifest = {"format": "turboinfer-orbax", "version": 1,
                "config": cfg, "qtensors": qt_meta,
                "metadata": metadata or {}}
    with open(os.path.join(path, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1, default=str)
    tlog.log_info("saved checkpoint %s (%d quantized tensors)", path,
                  len(qt_meta))


def _config_from_manifest(cfg: Dict[str, Any]) -> ModelConfig:
    cfg = dict(cfg)
    dtype = cfg.pop("dtype", "bfloat16")
    fields = {f.name for f in dataclasses.fields(ModelConfig)}
    kw = {k: v for k, v in cfg.items() if k in fields}
    # JSON round-trips tuples as lists; a frozen ModelConfig holding
    # lists is unhashable and breaks config equality (mapping.
    # config_from_dict converts `extra` too — keep both paths aligned)
    for k in ("rope_scaling", "extra"):
        if isinstance(kw.get(k), list):
            kw[k] = tuple(tuple(e) for e in kw[k])
    if isinstance(kw.get("rope_mode"), str):
        from turboinfer_tpu.config import RopeMode
        kw["rope_mode"] = RopeMode(kw["rope_mode"]) \
            if kw["rope_mode"] in [m.value for m in RopeMode] \
            else RopeMode[kw["rope_mode"].split(".")[-1]]
    return ModelConfig(**kw, dtype=jnp.dtype(dtype))


def load_checkpoint(path: str, mesh=None, specs=None):
    """Restore (params, config, metadata). With `mesh`, every array is
    restored DIRECTLY into its NamedSharding (specs default to the
    framework's TP layout, adapted per-leaf rank) — no host-replicated
    intermediate."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    with open(os.path.join(path, _MANIFEST)) as f:
        manifest = json.load(f)
    config = _config_from_manifest(manifest["config"])
    qt_meta = manifest["qtensors"]
    ckptr = ocp.PyTreeCheckpointer()
    pdir = os.path.join(path, "params")
    if mesh is None:
        plain = ckptr.restore(pdir)
    else:
        from jax.sharding import NamedSharding
        from turboinfer_tpu.parallel import shardings as sh
        specs = specs or sh.param_specs()

        def divisible(spec, shape):
            """Replicate any axis the mesh can't evenly shard (e.g. a
            scales G axis smaller than the tp degree)."""
            out = []
            for i, ax in enumerate(spec):
                if ax is None:
                    out.append(None)
                    continue
                names = ax if isinstance(ax, tuple) else (ax,)
                size = 1
                for n in names:
                    size *= dict(mesh.shape)[n]
                out.append(ax if shape[i] % size == 0 else None)
            return jax.sharding.PartitionSpec(*out)

        def spec_for(path_keys):
            node = specs
            for k in path_keys:
                if isinstance(node, dict) and k in node:
                    node = node[k]
                else:
                    return jax.sharding.PartitionSpec()
            return node

        meta = ckptr.metadata(pdir).item_metadata
        meta = meta.tree if hasattr(meta, "tree") else meta

        def restore_args(node, path):
            if isinstance(node, dict):
                # qtensor leaf-dicts use the LOGICAL weight's spec
                if "/".join(path) in qt_meta:
                    spec = spec_for(path)
                    return {k: ocp.ArrayRestoreArgs(
                        sharding=NamedSharding(
                            mesh, divisible(sh.fit_spec(spec,
                                                        len(v.shape)),
                                            v.shape)))
                        for k, v in node.items()}
                return {k: restore_args(v, path + [k])
                        for k, v in node.items()}
            spec = spec_for(path)
            return ocp.ArrayRestoreArgs(
                sharding=NamedSharding(
                    mesh, divisible(sh.fit_spec(spec, len(node.shape)),
                                    node.shape)))

        args = restore_args(meta, [])
        plain = ckptr.restore(pdir, restore_args=args)
    params = _join_qtensors(plain, qt_meta)
    tlog.log_info("restored checkpoint %s%s", path,
                  f" onto mesh {mesh.shape}" if mesh is not None else "")
    return params, config, manifest.get("metadata", {})
