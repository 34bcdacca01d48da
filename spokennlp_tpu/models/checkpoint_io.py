"""Framework-native checkpoint save/load (flax msgpack + json config).

The save_pretrained/from_pretrained equivalent for this framework: a
directory with ``params.msgpack`` + ``config.json`` (dataclass dump). The
CLIs accept these directories via --model_name_or_path alongside HF torch
checkpoint dirs (which go through models/hf_convert.py instead).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional, Tuple

import jax
import numpy as np
from flax import serialization

from spokennlp_tpu.configs import EncoderConfig

PARAMS_FILE = "params.msgpack"
CONFIG_FILE = "config.json"


def save_checkpoint(path: str, params, enc_cfg: Optional[EncoderConfig] = None):
    """Write params (+ encoder config) to a directory."""
    os.makedirs(path, exist_ok=True)
    params = jax.tree_util.tree_map(np.asarray, params)
    with open(os.path.join(path, PARAMS_FILE), "wb") as f:
        f.write(serialization.to_bytes(params))
    if enc_cfg is not None:
        with open(os.path.join(path, CONFIG_FILE), "w") as f:
            json.dump(dataclasses.asdict(enc_cfg), f, indent=2)


def is_native_checkpoint(path: str) -> bool:
    return os.path.isdir(path) and os.path.exists(os.path.join(path, PARAMS_FILE))


def load_checkpoint(path: str, target=None) -> Tuple[dict, Optional[EncoderConfig]]:
    """Read (params, encoder config or None). ``target`` (a param pytree)
    restores exact types/structure when provided."""
    with open(os.path.join(path, PARAMS_FILE), "rb") as f:
        data = f.read()
    if target is not None:
        params = serialization.from_bytes(target, data)
    else:
        params = serialization.msgpack_restore(data)
    cfg = None
    cfg_path = os.path.join(path, CONFIG_FILE)
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            cfg = EncoderConfig(**json.load(f))
    return params, cfg
