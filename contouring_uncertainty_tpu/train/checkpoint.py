"""Orbax checkpointing with self-describing metadata.

Capability parity with the reference's checkpoint management
(vital/vital/runner.py:128-136 deterministic best-ckpt naming;
vital/vital/utils/saving.py:99-146 self-describing checkpoints that store the
task class path in hparams). Here each checkpoint directory holds the orbax
state plus a `meta.json` with the task name and config so checkpoints can be
restored without knowing the task type.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp


def save_checkpoint(path: str | Path, tree: Any, meta: Optional[Dict] = None) -> Path:
    path = Path(path).absolute()
    if path.exists():
        import shutil

        shutil.rmtree(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path / "state", tree)
    if meta is not None:
        (path / "meta.json").write_text(json.dumps(meta, indent=2, default=str))
    return path


def restore_checkpoint(path: str | Path, target: Any = None) -> Any:
    path = Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        if target is not None:
            abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
            return ckptr.restore(path / "state", abstract)
        return ckptr.restore(path / "state")


def load_meta(path: str | Path) -> Dict:
    meta_file = Path(path) / "meta.json"
    return json.loads(meta_file.read_text()) if meta_file.exists() else {}
