#!/usr/bin/env python
"""One fp16 big-cap sharded-throughput row (config-4 envelope, VERDICT r2 #3).

Run ONE capacity per process (CLAUDE.md: a failed HBM allocation poisons
subsequent allocations in-process through the axon tunnel).

Usage: python scripts/bigcap_fp16_one.py CAP [f32]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax.numpy as jnp

    from tpuslam.bench.harness import sharded_bigcap_throughput

    cap = int(sys.argv[1])
    mdt = None if (len(sys.argv) > 2 and sys.argv[2] == "f32") else jnp.float16
    name = "float32" if mdt is None else "float16"
    try:
        r = sharded_bigcap_throughput(cap, n_map=1, n_epochs=4, map_dtype=mdt)
        print(json.dumps({"stage": "bigcap", "map_dtype": name,
                          **{k: round(float(v), 4) for k, v in r.items()}}),
              flush=True)
    except Exception as e:
        print(json.dumps({"stage": "bigcap", "capacity": cap,
                          "map_dtype": name,
                          "error": f"{type(e).__name__}: {str(e)[:200]}"}),
              flush=True)


if __name__ == "__main__":
    main()
