"""Pretrained-weight acquisition (reference-parity download paths).

The reference auto-downloads CLIP ViT-B/16 with sha256 verification
(``models/backbones/clip/clip.py:23-68``) and ImageNet ResNet-50 from the
torchvision model zoo (``simpleVQA_model.py:318-324``); its Swin trunk and
CONTRIQUE tool load from local checkpoints whose public sources are the
Video-Swin and CONTRIQUE releases.  This module provides the same
capability for the rebuild: one command from an empty cache to the torch
checkpoints that ``kvq_tpu.cli.convert`` turns into msgpack param trees.

Hermetic environments (no egress) are first-class: every function accepts
pre-placed files in the cache dir (override with ``KVQ_WEIGHTS_DIR``) and
only touches the network when a file is missing.
"""

from __future__ import annotations

import hashlib
import os
import urllib.request

_DEFAULT_CACHE = os.path.expanduser("~/.cache/kvq_tpu/weights")

# name -> (url, sha256 or None, filename)
# CLIP: full sha256 embedded in the URL path (the reference's own check,
# clip/clip.py:23-38).  torchvision: filename carries the first 8 hex chars
# of the sha256 (model-zoo convention).
WEIGHT_SOURCES: dict[str, tuple[str, str | None, str]] = {
    "clip_vit_b16": (
        "https://openaipublic.azureedge.net/clip/models/"
        "5806e77cd80f8b59890b7e101eabd078d9fb84e6937f9e85e4ecb61988df416f/"
        "ViT-B-16.pt",
        "5806e77cd80f8b59890b7e101eabd078d9fb84e6937f9e85e4ecb61988df416f",
        "ViT-B-16.pt",
    ),
    "resnet50_imagenet": (
        "https://download.pytorch.org/models/resnet50-19c8e357.pth",
        "19c8e357",  # prefix check (torchvision convention)
        "resnet50-19c8e357.pth",
    ),
    "swin_tiny_kinetics400": (
        "https://github.com/SwinTransformer/storage/releases/download/"
        "v1.0.4/swin_tiny_patch244_window877_kinetics400_1k.pth",
        None,
        "swin_tiny_patch244_window877_kinetics400_1k.pth",
    ),
    "slowfast_r50_kinetics": (
        "https://dl.fbaipublicfiles.com/pytorchvideo/model_zoo/kinetics/"
        "SLOWFAST_8x8_R50.pyth",
        None,
        "SLOWFAST_8x8_R50.pyth",
    ),
    # CONTRIQUE_checkpoint25.tar is distributed via the CONTRIQUE release
    # (github.com/pavancm/CONTRIQUE) — no stable direct URL; place the file
    # in the cache dir by hand.
}


def cache_dir() -> str:
    return os.environ.get("KVQ_WEIGHTS_DIR", _DEFAULT_CACHE)


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def verify(path: str, expected: str | None) -> bool:
    if expected is None:
        return True
    return _sha256(path).startswith(expected)


def fetch(name: str, cache: str | None = None, download: bool = True) -> str:
    """Return the local path of a named checkpoint, downloading + sha256-
    verifying it if absent and ``download`` is allowed."""
    if name not in WEIGHT_SOURCES:
        raise KeyError(
            f"unknown weight '{name}'; known: {sorted(WEIGHT_SOURCES)}"
        )
    url, sha, fname = WEIGHT_SOURCES[name]
    cache = cache or cache_dir()
    path = os.path.join(cache, fname)
    if os.path.exists(path):
        if not verify(path, sha):
            raise IOError(
                f"{path} exists but fails its sha256 check; delete and retry"
            )
        return path
    if not download:
        raise FileNotFoundError(
            f"{path} not present and downloads disabled; place the file "
            f"there by hand (source: {url})"
        )
    os.makedirs(cache, exist_ok=True)
    tmp = path + ".part"
    try:
        urllib.request.urlretrieve(url, tmp)
    except Exception as e:  # no-egress hosts land here
        raise IOError(
            f"download of {url} failed ({e}); on hermetic hosts place the "
            f"file at {path} by hand"
        ) from e
    if not verify(tmp, sha):
        os.remove(tmp)
        raise IOError(f"downloaded {url} fails its sha256 check")
    os.replace(tmp, path)
    return path


# Checkpoints the reference needs but that have no stable direct URL —
# fetch_all reports actionable guidance instead of silently omitting them.
MANUAL_SOURCES = {
    "CONTRIQUE_checkpoint25.tar": (
        "no stable direct URL — download from the CONTRIQUE release "
        "(github.com/pavancm/CONTRIQUE, 'CONTRIQUE_checkpoint25.tar') and "
        "place it in {cache}; KSVQE's distortion tool requires it "
        "(reference KSVQE_model.py:1078)"
    ),
}


def fetch_all(cache: str | None = None, download: bool = True) -> dict:
    """Best-effort fetch of every known checkpoint; returns
    {name: path-or-error-string}.  Manual-acquisition checkpoints
    (MANUAL_SOURCES) resolve to their cached path when pre-placed and to
    an actionable MANUAL: instruction otherwise."""
    out = {}
    for name in WEIGHT_SOURCES:
        try:
            out[name] = fetch(name, cache=cache, download=download)
        except Exception as e:
            out[name] = f"ERROR: {e}"
    cdir = cache or cache_dir()
    for name, guidance in MANUAL_SOURCES.items():
        path = os.path.join(cdir, name)
        if os.path.exists(path):
            out[name] = path
        else:
            out[name] = "MANUAL: " + guidance.format(cache=cdir)
    return out
