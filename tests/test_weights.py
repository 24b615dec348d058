"""Weight-acquisition cache logic (offline paths only — no egress here).
Reference behavior: sha256-verified CLIP download, clip/clip.py:23-68."""

import hashlib

import pytest

from kvq_tpu.core import weights as W


def test_unknown_name_raises():
    with pytest.raises(KeyError):
        W.fetch("nope")


def test_missing_without_download_raises(tmp_path):
    with pytest.raises(FileNotFoundError) as e:
        W.fetch("clip_vit_b16", cache=str(tmp_path), download=False)
    assert "ViT-B-16.pt" in str(e.value)


def test_preplaced_file_with_bad_hash_rejected(tmp_path):
    p = tmp_path / "ViT-B-16.pt"
    p.write_bytes(b"not a checkpoint")
    with pytest.raises(IOError):
        W.fetch("clip_vit_b16", cache=str(tmp_path), download=False)


def test_preplaced_file_with_good_hash_accepted(tmp_path, monkeypatch):
    payload = b"fake resnet"
    digest = hashlib.sha256(payload).hexdigest()
    monkeypatch.setitem(
        W.WEIGHT_SOURCES,
        "resnet50_imagenet",
        ("https://example.invalid/x.pth", digest[:8], "x.pth"),
    )
    p = tmp_path / "x.pth"
    p.write_bytes(payload)
    assert W.fetch("resnet50_imagenet", cache=str(tmp_path)) == str(p)


def test_cache_dir_env_override(monkeypatch, tmp_path):
    monkeypatch.setenv("KVQ_WEIGHTS_DIR", str(tmp_path))
    assert W.cache_dir() == str(tmp_path)


def test_fetch_all_reports_manual_contrique(tmp_path):
    from kvq_tpu.core import weights as W

    out = W.fetch_all(cache=str(tmp_path), download=False)
    assert out["CONTRIQUE_checkpoint25.tar"].startswith("MANUAL: ")
    assert "github.com/pavancm/CONTRIQUE" in out["CONTRIQUE_checkpoint25.tar"]
    # pre-placed file resolves to its path instead
    p = tmp_path / "CONTRIQUE_checkpoint25.tar"
    p.write_bytes(b"stub")
    out = W.fetch_all(cache=str(tmp_path), download=False)
    assert out["CONTRIQUE_checkpoint25.tar"] == str(p)
