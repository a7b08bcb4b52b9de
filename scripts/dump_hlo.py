"""Dump the optimized HLO of the flagship _track_step with source
metadata, to attribute profiler op names (custom-call.N, fusion.N,
while.N) to vo_tpu source lines.

Usage: python scripts/dump_hlo.py [out.txt]
"""

import functools
import re
import sys

import numpy as np

import vo_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from vo_tpu.models.vo import VOConfig, _track_step, _tracking_init, \
    detect_and_describe


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/track_step_hlo.txt"
    K = jnp.asarray(
        [[707.0912, 0.0, 601.8873], [0.0, 707.0912, 183.1104],
         [0.0, 0.0, 1.0]], jnp.float32,
    )
    cfg = VOConfig()
    img = jnp.zeros((376, 1241), jnp.float32)
    feats = jax.eval_shape(functools.partial(detect_and_describe, cfg=cfg),
                           img)
    feats = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), feats)
    state = jax.jit(functools.partial(_tracking_init, cfg=cfg))(
        feats, img, jax.random.PRNGKey(0)
    )
    fn = jax.jit(functools.partial(_track_step, cfg=cfg))
    txt = fn.lower(state, img, K).compile().as_text()
    with open(out_path, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} bytes to {out_path}")

    # summarize: op name -> metadata source line for profiler-visible ops
    pat = re.compile(
        r"(%?(fusion|custom-call|while|convolution|reshape|pad|"
        r"multiply_add_fusion)[.\w]*) = .*?(metadata=\{[^}]*\})?$"
    )
    for line in txt.splitlines():
        line = line.strip()
        m = re.match(
            r"%?((?:fusion|custom-call|while|multiply_add_fusion|"
            r"convolution_bitcast_fusion|reshape|pad)[.\d]*) = ", line)
        if not m:
            continue
        meta = re.search(r'op_name="([^"]*)"', line)
        src = re.search(r'source_file="([^"]*)".*source_line=(\d+)', line)
        cc = re.search(r'custom_call_target="([^"]*)"', line)
        bits = [m.group(1)]
        if cc:
            bits.append(f"target={cc.group(1)}")
        if meta:
            bits.append(meta.group(1)[:120])
        if src:
            bits.append(f"{src.group(1).split('/')[-1]}:{src.group(2)}")
        print("  ".join(bits))


if __name__ == "__main__":
    main()
