"""Monte-Carlo NEES sweep on the real 101-scan consistency dataset.

The reference runs one seed per launch (consistency.cpp); the multi-seed
protocol here reports the mean NEES ratio with its chi-square-derived
confidence interval.  Produces artifacts/consistency_multiseed.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n_seeds=10):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from balm_tpu.pipelines import consistency

    cfg = consistency.ConsistencyConfig()
    out = consistency.run_multi(cfg, seeds=tuple(range(n_seeds)),
                                verbose=True)
    # 2-sigma band for the MEAN ratio
    lo = 1.0 - 2 * out["sd_theory_of_mean"]
    hi = 1.0 + 2 * out["sd_theory_of_mean"]
    out["consistent"] = bool(lo <= out["mean_ratio"] <= hi)
    out["band_2sigma"] = [lo, hi]
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "artifacts", "consistency_multiseed.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: v for k, v in out.items()
                      if k not in ("nees",)}, indent=1))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10)
