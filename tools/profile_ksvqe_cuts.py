"""Cumulative-cut timing of the KSVQE forward on TPU.

Times prefixes of the forward graph (QRS/CLIP -> +patch_embed -> +distortion
tokens -> full) so each component's marginal cost is the difference of two
adjacent cuts — avoids standalone-module measurements drifting from the
in-graph reality.
"""

import os
import sys

import numpy as np

sys.path.insert(0, ".")

from tools.profile_ksvqe import timed_loop  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/kvq_jax_cache")

    from kvq_tpu.nn.ksvqe import KSVQE, ksvqe_config
    from kvq_tpu.nn.regionnet import keyframe_schedule
    from kvq_tpu.train.losses import distortion_contrastive_supervised

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 96
    s2d = os.environ.get("KVQ_S2D", "0") == "1"  # match the shipped config
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    frag = rng.normal(size=(B, T, 288, 288, 3)).astype(np.float32)
    if s2d:
        from kvq_tpu.data.fragments import s2d_pack

        frag = np.stack([s2d_pack(f) for f in frag])
    batch = {
        "fragment": jnp.asarray(frag, dt),
        "resize_video": jnp.asarray(rng.normal(size=(B, T, 112, 112, 3)), dt),
        "dis_label": jnp.zeros((B,), jnp.int32),
    }
    cfg = ksvqe_config(
        {"num_samples": 1, "sample_type": "topkpertubation",
         "CLIP_location": 8, "cls_use": True, "tuning_stage": 1,
         "a1": 1, "a2": 2, "checkpoint": False, "use_pallas": True,
         "s2d_input": s2d}
    )
    print(f"s2d_input={s2d}", flush=True)
    model = KSVQE(config=cfg, dtype=dt)
    vs = jax.jit(
        lambda: model.init(
            {"params": jax.random.key(0), "qrs": jax.random.key(1)},
            batch, train=False,
        )
    )()
    jax.block_until_ready(vs)

    def prefix(self, b, cut):
        revideo = b["resize_video"].astype(self.dtype)
        fragment = b["fragment"].astype(self.dtype)
        Bq = fragment.shape[0]
        Tq = fragment.shape[1] * (2 if self.config.s2d_input else 1)
        keyframes, group_id = keyframe_schedule(Tq)
        kf = revideo[:, jnp.asarray(keyframes)].reshape(
            Bq * 4, *revideo.shape[2:]
        )
        cls_attn, _ct, pat_tokens = self.CLIP_tool(kf)
        L = cls_attn.shape[-1]
        cls_attn = cls_attn.reshape(Bq, 4, L)
        if cut == "clip":
            return cls_attn
        if self.config.s2d_input:
            # packed path: QRS select + embed + dist unpack are one unit
            if cut == "qrs":
                return self.selector.select(
                    cls_attn, group_id,
                    (fragment.shape[2] // 8, fragment.shape[3] // 8),
                    train=False, key=None,
                )
            x, dist_in = self._select_and_embed_packed(
                fragment, cls_attn, group_id, train=False, key=None
            )
            if cut == "embed":
                return x
        else:
            x_sel = self.selector(fragment, cls_attn, group_id, train=False)
            if cut == "qrs":
                return x_sel
            x = self.patch_embed(x_sel)
            if cut == "embed":
                return x
            dist_in = jax.lax.stop_gradient(x_sel)[:, ::2]
        dist_tok = self.distortion_tool(dist_in)
        dist_tok = 0.2 * self.dist_adapter(dist_tok) + 0.8 * dist_tok
        loss = distortion_contrastive_supervised(dist_tok, b["dis_label"])
        if cut == "dist":
            return x.sum() + dist_tok.sum() + loss
        if cut == "stages":
            # trunk stages only — CDM modulation skipped — to split the
            # stages+CDM marginal
            for stage in self.layers:
                x = stage(x, train=False)
            return x.sum() + dist_tok.sum() + loss
        raise ValueError(cut)

    cuts = ["clip", "qrs", "embed", "dist", "stages"]
    times = {}
    for cut in cuts:
        s = timed_loop(
            lambda v, b, c=cut: model.apply(
                v, b, c, method=prefix
            ),
            vs, batch,
        )
        times[cut] = s
        print(f"prefix through {cut:6s}: {s * 1e3:7.1f} ms", flush=True)

    s = timed_loop(
        lambda v, b: model.apply(v, b, train=False)[0], vs, batch
    )
    times["full"] = s
    print(f"full forward        : {s * 1e3:7.1f} ms", flush=True)

    print()
    print(f"CLIP+keyframes      : {times['clip'] * 1e3:7.1f} ms")
    print(f"QRS marginal        : {(times['qrs'] - times['clip']) * 1e3:7.1f} ms")
    print(f"patch_embed marginal: {(times['embed'] - times['qrs']) * 1e3:7.1f} ms")
    print(f"dist-path marginal  : {(times['dist'] - times['embed']) * 1e3:7.1f} ms")
    print(f"stages marginal     : {(times['stages'] - times['dist']) * 1e3:7.1f} ms")
    print(f"CDM marginal        : {(times['full'] - times['stages']) * 1e3:7.1f} ms")


if __name__ == "__main__":
    main()
