"""Per-loss-term gradient norms at init (iter-0 grad-spike forensics).

Computes grad(sum_i w_i * L_i) once under jit and sweeps one-hot weight
vectors w, giving each loss term's isolated gradient norm at random init
with a single XLA compile. Run on CPU:

    JAX_PLATFORMS=cpu python tools/grad_probe.py [--config-file ...]
"""
from __future__ import annotations

import argparse
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from nopesac_tpu.config.config import get_cfg  # noqa: E402
from nopesac_tpu.data.mapper import PairMapper, collate  # noqa: E402
from nopesac_tpu.data.synthetic import make_dataset  # noqa: E402
from nopesac_tpu.engine.trainer import build_model_from_cfg  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file", default="configs/smoke_synthetic.yaml")
    ap.add_argument("opts", nargs="*", default=[])
    args = ap.parse_args()

    cfg = get_cfg()
    cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()

    h, w = cfg.INPUT.IMAGE_SIZE
    model = build_model_from_cfg(cfg)
    data = make_dataset(n_pairs=cfg.SOLVER.IMS_PER_BATCH, n_planes=4, h=h, w=w)
    mapper = PairMapper(is_train=True, dataset_kind="mp3d", image_size=(h, w))
    batch = collate([mapper(d) for d in data])
    batch.pop("meta", None)
    batch = jax.tree_util.tree_map(jnp.asarray, batch)

    variables = jax.jit(
        lambda b: model.init(
            {"params": jax.random.PRNGKey(cfg.SEED),
             "dropout": jax.random.PRNGKey(cfg.SEED + 1)},
            b, jax.random.PRNGKey(0), method=model.init_all,
        )
    )(batch)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    # discover term names with one eager-ish forward
    aim_rng = jax.random.PRNGKey(7)
    drop_rng = jax.random.PRNGKey(8)
    losses, _ = jax.jit(
        lambda p: model.apply(
            {"params": p, "batch_stats": batch_stats}, batch, aim_rng,
            method=model.train_forward, mutable=["batch_stats"],
            rngs={"dropout": drop_rng})
    )(params)
    names = sorted(losses.keys())
    print(f"{len(names)} loss terms")

    def weighted_grad_norm(p, w_vec):
        def loss_fn(pp):
            ls, _ = model.apply(
                {"params": pp, "batch_stats": batch_stats}, batch, aim_rng,
                method=model.train_forward, mutable=["batch_stats"],
                rngs={"dropout": drop_rng})
            total = jnp.asarray(0.0, jnp.float32)
            for i, k in enumerate(names):
                total = total + w_vec[i] * ls[k].astype(jnp.float32)
            return total
        g = jax.grad(loss_fn)(p)
        import optax
        return optax.global_norm(g)

    fn = jax.jit(weighted_grad_norm)
    rows = []
    for i, k in enumerate(names):
        w_vec = jnp.zeros(len(names)).at[i].set(1.0)
        gn = float(fn(params, w_vec))
        rows.append((gn, k, float(losses[k])))
        print(f"  {k:45s} loss={float(losses[k]):12.4f} gradnorm={gn:.4e}",
              flush=True)
    rows.sort(reverse=True)
    print("\nTop-10 by grad norm at init:")
    for gn, k, lv in rows[:10]:
        print(f"  {gn:.4e}  {k}  (loss={lv:.4f})")


if __name__ == "__main__":
    main()
