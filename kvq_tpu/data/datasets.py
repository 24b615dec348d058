"""Dataset classes producing the same per-sample dict contract as the
reference (channels-last arrays instead of torch CHW tensors).

  - :class:`KVQDataset`       == ViewDecompositionDataset_KVQ
        (fusion_datasets.py:930-1051): 4-column TXT annotations
        ``filename,cls_label,dis_label,score``; emits ``fragment``
        (imagenet_255-normalized mosaic), ``resize_video`` (CLIP-normalized
        resize view), ``ori_fragment``, ``dis_label``, ``label``, ...
  - :class:`SimpleVQADataset` == ViewDecompositionDataset_add_forSimpleVQA
        (fusion_datasets.py:786-927): CSV with header ``filename,score``;
        emits ``simpleVQA`` view + precomputed SlowFast ``feat``.
  - :class:`GenericViewDataset` == ViewDecompositionDataset
        (fusion_datasets.py:664-775): TXT ``filename,_,_,label``.

Reference-name aliases are registered so reference YAML configs resolve
unchanged (``data.train.type: ViewDecompositionDataset_KVQ``).
"""

from __future__ import annotations

import csv
import os.path as osp
import zlib
from typing import Any, Callable

import numpy as np

from ..core.registry import DATASETS
from . import views as V
from .decode import SyntheticVideoSource, decode_views, open_video
from .fragments import get_spatial_fragments
from .samplers import make_sampler


def _filter_view_opts(sopt: dict) -> dict:
    """Drop non-view keys before passing a sample_types entry to view fns."""
    drop = {"clip_len", "frame_interval", "num_clips", "t_frag", "phase"}
    return {k: v for k, v in sopt.items() if k not in drop}


def _native_fragment_views(raw: np.ndarray, sopt: dict, rng):
    """Fused native (C++) fragment-mosaic + resize views for the KVQ
    sample; returns (fragment, resize_video) float32 or None to fall back
    to the numpy path (library not built, upsample fallback needed, or
    non-uint8 input)."""
    try:
        from .. import runtime
    except Exception:
        return None
    if not runtime.available() or raw.dtype != np.uint8:
        return None
    fh = sopt.get("fragments_h", 7)
    fw = sopt.get("fragments_w", 7)
    sh_, sw_ = sopt.get("fsize_h", 32), sopt.get("fsize_w", 32)
    aligned = sopt.get("aligned", 32)
    T, H, W = raw.shape[:3]
    if T == 1:
        aligned = 1
    if min(H / (fh * sh_), W / (fw * sw_)) < 1:
        return None  # upsample fallback path stays in numpy
    if T % aligned != 0:
        return None
    from .fragments import fragment_index_maps

    ymap, xmap = fragment_index_maps(
        H, W, T, fh, fw, sh_, sw_, aligned, rng=rng
    )
    fragment = runtime.fragment_mosaic_normalize(
        raw, ymap, xmap, aligned, V.IMAGENET_255_MEAN, V.IMAGENET_255_STD
    )
    resize = runtime.resize_normalize(
        raw,
        sopt.get("size_h", 224),
        sopt.get("size_w", 224),
        V.CLIP_MEAN,
        V.CLIP_STD,
        div255=True,
    )
    return fragment, resize


class _ViewDatasetBase:
    """Common machinery: annotation list, samplers, per-sample RNG."""

    def __init__(self, opt: dict, namelist=None):
        self.opt = opt
        self.weight = opt.get("weight", 0.5)
        self.ann_file = opt["anno_file"]
        self.data_prefix = opt.get("data_prefix", "")
        self.sample_types: dict[str, dict] = opt["sample_types"]
        self.phase = opt.get("phase", "test")
        self.augment = opt.get("augment", False)
        self.seed = int(opt.get("seed", 42))
        self.namelist = namelist
        # source_factory lets tests inject synthetic videos hermetically.
        self.source_factory: Callable[[str], Any] = opt.get(
            "source_factory", lambda path: open_video(path, pad_short=130)
        )
        self.video_infos: list[dict] = []
        self._read_annotations()
        scores = [vi["label"] for vi in self.video_infos]
        self.max = max(scores) if scores else 0.0
        self.min = min(scores) if scores else 0.0

    # -- per-sample deterministic RNG (upgrade over the reference's global,
    #    effectively-unseeded sampling state, SURVEY.md §5.1.12)
    def _rng(self, index: int, epoch: int = 0) -> np.random.Generator:
        return np.random.default_rng((self.seed, epoch, index))

    def _read_annotations(self) -> None:
        raise NotImplementedError

    def _samplers(self, rng: np.random.Generator) -> dict:
        return {k: make_sampler(s, rng=rng) for k, s in self.sample_types.items()}

    def __len__(self) -> int:
        return len(self.video_infos)


@DATASETS.register("KVQDataset")
class KVQDataset(_ViewDatasetBase):
    def _read_annotations(self) -> None:
        if isinstance(self.ann_file, list):
            self.video_infos = self.ann_file
            return
        with open(self.ann_file, "r") as fin:
            for line in fin:
                filename, cls_label, dis_label, label = line.strip().split(",")
                self.video_infos.append(
                    dict(
                        filename=osp.join(self.data_prefix, filename),
                        label=float(label),
                        cls_label=int(float(cls_label)),
                        dis_label=int(float(dis_label)),
                        video_name=filename,
                    )
                )

    def __getitem__(self, index: int, epoch: int = 0) -> dict:
        info = self.video_infos[index]
        rng = self._rng(index, epoch)
        is_train = self.phase == "train"
        source = self.source_factory(info["filename"])
        videos, frame_inds = decode_views(source, self._samplers(rng), is_train)

        data: dict[str, Any] = {}
        for stype, raw in videos.items():
            sopt = _filter_view_opts(self.sample_types[stype])
            frag_native = _native_fragment_views(raw, sopt, rng)
            if frag_native is not None:
                data["fragment"], data["resize_video"] = frag_native
            else:
                frag = V.get_single_view(raw, stype, rng=rng, **sopt)
                resize = V.get_resized_video(raw, **sopt)
                data["fragment"] = V.normalize(frag, "imagenet_255")
                data["resize_video"] = V.normalize(resize, "clip")
            # ``ori_fragment`` (un-normalized mosaic) is part of the
            # reference batch contract (fusion_datasets.py:1028) but is
            # DEAD there — no reference trainer or model ever reads it,
            # yet every sample pays a second full mosaic + collate + H2D.
            # Opt-in here; the key reappears with
            # ``opt["return_ori_fragment"] = True``.
            if self.opt.get("return_ori_fragment", False):
                data["ori_fragment"] = get_spatial_fragments(
                    raw, rng=rng, **sopt
                ).astype(np.float32)
            data["original_shape"] = raw.shape

        data["num_clips"] = {k: s["num_clips"] for k, s in self.sample_types.items()}
        data["clip_len"] = {k: s["clip_len"] for k, s in self.sample_types.items()}
        data["frame_inds"] = frame_inds
        data["dis_label"] = info["dis_label"]
        data["label"] = info["label"]
        # global dataset position: lets sharded/mesh eval identify and
        # dedupe rows without assuming device ordering
        data["sample_index"] = int(index)
        data["name"] = info["filename"]
        data["video_name"] = info["video_name"]
        # opt-in: ship the fragment space-to-depth packed (s2d_pack) so the
        # model's patch embed is a plain matmul — requires the model side
        # to run with ``s2d_input: true`` (nn/ksvqe.py); bitwise-identical
        # outputs (tests/test_s2d.py)
        if self.opt.get("fragment_s2d", False):
            from .fragments import s2d_pack

            data["fragment"] = s2d_pack(np.ascontiguousarray(data["fragment"]))
        return data


@DATASETS.register("SimpleVQADataset")
class SimpleVQADataset(_ViewDatasetBase):
    VIDEO_LENGTH_READ = 8  # reference fusion_datasets.py:860

    def __init__(self, opt: dict, namelist=None):
        self.data_prefix_3d = opt.get("data_prefix_3D", "")
        self.feature_type = opt.get("feature_type", "SlowFast")
        # feature_factory(video_name) -> (8, 2304) array, for hermetic tests
        self.feature_factory = opt.get("feature_factory", None)
        super().__init__(opt, namelist)

    def _read_annotations(self) -> None:
        if isinstance(self.ann_file, list):
            self.video_infos = self.ann_file
            return
        with open(self.ann_file, newline="") as f:
            reader = csv.reader(f)
            next(reader)  # header row (reference fusion_datasets.py:840)
            for row in reader:
                self.video_infos.append(
                    dict(
                        filename=osp.join(self.data_prefix, row[0]),
                        label=float(row[1]),
                        video_name=row[0],
                    )
                )

    def _load_features(self, video_name: str) -> np.ndarray:
        # reference hardcodes 8 = its clip_len (fusion_datasets.py:860);
        # follow clip_len so features align with frames for any config
        n = next(
            (s.get("clip_len", self.VIDEO_LENGTH_READ)
             for s in self.sample_types.values()),
            self.VIDEO_LENGTH_READ,
        )
        if self.feature_factory is not None:
            return np.asarray(self.feature_factory(video_name), dtype=np.float32)
        folder = osp.join(self.data_prefix_3d, video_name)
        dims = {"Slow": 2048, "Fast": 256, "SlowFast": 2304}[self.feature_type]
        feat = np.zeros((n, dims), dtype=np.float32)
        for i in range(n):
            if self.feature_type in ("Slow", "SlowFast"):
                slow = np.load(
                    osp.join(folder, f"feature_{i}_slow_feature.npy")
                ).reshape(-1)
            if self.feature_type in ("Fast", "SlowFast"):
                fast = np.load(
                    osp.join(folder, f"feature_{i}_fast_feature.npy")
                ).reshape(-1)
            if self.feature_type == "Slow":
                feat[i] = slow
            elif self.feature_type == "Fast":
                feat[i] = fast
            else:
                feat[i] = np.concatenate([slow, fast])
        return feat

    def __getitem__(self, index: int, epoch: int = 0) -> dict:
        info = self.video_infos[index]
        rng = self._rng(index, epoch)
        is_train = self.phase == "train"
        source = self.source_factory(info["filename"])
        videos, frame_inds = decode_views(source, self._samplers(rng), is_train)

        data: dict[str, Any] = {}
        for stype, raw in videos.items():
            sopt = _filter_view_opts(self.sample_types[stype])
            view = V.get_single_view(
                raw, stype, rng=rng, phase=self.phase, **sopt
            )
            # Reference quirk (replicated): unit-scale ImageNet mean/std on
            # raw 0-255 pixels, no /255 (fusion_datasets.py:811-812,901-903).
            data[stype] = V.normalize(view, "imagenet_unit_on_255")

        data["num_clips"] = {k: s["num_clips"] for k, s in self.sample_types.items()}
        data["clip_len"] = {k: s["clip_len"] for k, s in self.sample_types.items()}
        data["frame_inds"] = frame_inds
        data["label"] = info["label"]
        # global dataset position: lets sharded/mesh eval identify and
        # dedupe rows without assuming device ordering
        data["sample_index"] = int(index)
        data["video_name"] = info["video_name"]
        if "simpleVQA" in data:
            data["feat"] = self._load_features(info["video_name"])
        data["name"] = info["filename"]
        return data


@DATASETS.register("GenericViewDataset")
class GenericViewDataset(_ViewDatasetBase):
    def _read_annotations(self) -> None:
        if isinstance(self.ann_file, list):
            self.video_infos = self.ann_file
            return
        with open(self.ann_file, "r") as fin:
            for line in fin:
                parts = line.strip().split(",")
                filename, label = parts[0], float(parts[-1])
                self.video_infos.append(
                    dict(
                        filename=osp.join(self.data_prefix, filename),
                        label=label,
                        video_name=filename,
                    )
                )

    def __getitem__(self, index: int, epoch: int = 0) -> dict:
        info = self.video_infos[index]
        rng = self._rng(index, epoch)
        is_train = self.phase == "train"
        source = self.source_factory(info["filename"])
        videos, frame_inds = decode_views(source, self._samplers(rng), is_train)

        data: dict[str, Any] = {}
        for stype, raw in videos.items():
            sopt = _filter_view_opts(self.sample_types[stype])
            view = V.get_single_view(raw, stype, rng=rng, **sopt)
            # 0-255 ImageNet normalization (reference fusion_datasets.py:687-688)
            data[stype] = V.normalize(view, "imagenet_255")

        data["num_clips"] = {k: s["num_clips"] for k, s in self.sample_types.items()}
        data["clip_len"] = {k: s["clip_len"] for k, s in self.sample_types.items()}
        data["frame_inds"] = frame_inds
        data["label"] = info["label"]
        # global dataset position: lets sharded/mesh eval identify and
        # dedupe rows without assuming device ordering
        data["sample_index"] = int(index)
        data["video_name"] = info["video_name"]
        data["name"] = info["filename"]
        return data


# Reference-name aliases so unmodified reference YAML configs resolve.
ViewDecompositionDataset_KVQ = KVQDataset
ViewDecompositionDataset_add_forSimpleVQA = SimpleVQADataset
ViewDecompositionDataset = GenericViewDataset
DATASETS.register("ViewDecompositionDataset_KVQ")(KVQDataset)
DATASETS.register("ViewDecompositionDataset_add_forSimpleVQA")(SimpleVQADataset)
DATASETS.register("ViewDecompositionDataset")(GenericViewDataset)


def make_synthetic_opt(
    n_videos: int = 4,
    n_frames: int = 140,
    height: int = 540,
    width: int = 960,
    sample_types: dict | None = None,
    phase: str = "train",
    seed: int = 0,
    with_features: bool = False,
) -> dict:
    """Build a dataset opt backed by synthetic in-memory videos (hermetic)."""
    ann = [
        dict(
            filename=f"synthetic_{i}.mp4",
            label=float(i) / max(n_videos - 1, 1) * 4 + 1,
            cls_label=i % 3,
            dis_label=i % 4,
            video_name=f"synthetic_{i}.mp4",
        )
        for i in range(n_videos)
    ]
    st = sample_types or {}
    opt = {
        "anno_file": ann,
        "data_prefix": "",
        "phase": phase,
        "seed": seed,
        "sample_types": st,
        # NOTE: zlib.crc32, NOT hash() — python string hashing is salted
        # per process, which would give every process (multi-host tests,
        # test re-runs) different synthetic data for the same name.
        "source_factory": lambda path: SyntheticVideoSource(
            n_frames, height, width, seed=zlib.crc32(path.encode()) % (2**31)
        ),
    }
    if with_features:
        # features per frame of the sampled clip (the reference hardcodes 8
        # = clip_len of its config, fusion_datasets.py:860)
        n_feat = next(iter(st.values()), {}).get("clip_len", 8)
        opt["feature_factory"] = lambda name: np.random.default_rng(
            zlib.crc32(name.encode()) % (2**31)
        ).normal(size=(n_feat, 2304)).astype(np.float32)
        opt["data_prefix_3D"] = ""
        opt["feature_type"] = "SlowFast"
    return opt


def make_learnable_synthetic_opt(
    n_videos: int = 16,
    n_frames: int = 140,
    height: int = 540,
    width: int = 960,
    sample_types: dict | None = None,
    phase: str = "train",
    seed: int = 0,
    with_features: bool = False,
) -> dict:
    """Synthetic dataset whose labels are LEARNABLE, not arbitrary.

    Each video is a smooth pattern + Gaussian noise of per-video amplitude
    ``a`` (SyntheticVideoSource noise mode); the quality label is the
    computable statistic ``5 - 4a`` (clean = 5, noisiest = 1) and
    ``dis_label`` buckets ``a`` into 4 groups so the KSVQE supervised
    contrastive distortion loss is also meaningful.  Different phases draw
    different videos AND different amplitudes from the same distribution,
    so a held-out split genuinely tests generalization of the
    noise -> score mapping (VERDICT r3 item 7: prove the trainer *learns*,
    not merely runs).
    """
    rng = np.random.default_rng((seed, zlib.crc32(phase.encode())))
    amps = rng.permutation(np.linspace(0.05, 0.95, n_videos))
    # phase-distinct jitter keeps val amplitudes off the train grid
    amps = np.clip(amps + rng.uniform(-0.02, 0.02, n_videos), 0.0, 1.0)
    names = [f"learnable_{phase}_{i}.mp4" for i in range(n_videos)]
    ann = [
        dict(
            filename=names[i],
            label=float(5.0 - 4.0 * amps[i]),
            cls_label=i % 3,
            dis_label=int(min(amps[i] * 4, 3)),
            video_name=names[i],
        )
        for i in range(n_videos)
    ]
    amp_by_path = {names[i]: float(amps[i]) for i in range(n_videos)}
    st = sample_types or {}
    opt = {
        "anno_file": ann,
        "data_prefix": "",
        "phase": phase,
        "seed": seed,
        "sample_types": st,
        "source_factory": lambda path: SyntheticVideoSource(
            n_frames, height, width,
            seed=zlib.crc32(path.encode()) % (2**31),
            noise_amp=amp_by_path[path],
        ),
    }
    if with_features:
        n_feat = next(iter(st.values()), {}).get("clip_len", 8)
        opt["feature_factory"] = lambda name: np.random.default_rng(
            zlib.crc32(name.encode()) % (2**31)
        ).normal(size=(n_feat, 2304)).astype(np.float32)
        opt["data_prefix_3D"] = ""
        opt["feature_type"] = "SlowFast"
    return opt
