"""Compile the row-exit program AOT on TPU and print XLA's memory
analysis (argument/output/temp/peak bytes) plus the backend string --
finds what OOMs at _exit_rows without running it."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def ana(tag, compiled):
    m = compiled.memory_analysis()
    if m is None:
        print(f"[{tag}] no memory analysis available")
        return
    gib = 2.0**30
    print(f"[{tag}] args={m.argument_size_in_bytes/gib:.2f} "
          f"out={m.output_size_in_bytes/gib:.2f} "
          f"temp={m.temp_size_in_bytes/gib:.2f} "
          f"alias={m.alias_size_in_bytes/gib:.2f} "
          f"peak(args+out+temp-alias)="
          f"{(m.argument_size_in_bytes + m.output_size_in_bytes + m.temp_size_in_bytes - m.alias_size_in_bytes)/gib:.2f} GiB",
          flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from segfusion_tpu.ops import rowvol
    from segfusion_tpu.core.pipeline import Pipeline
    from segfusion_tpu.config import load_config

    print("default_backend:", jax.default_backend(), flush=True)
    print("device platform:", jax.devices()[0].platform, flush=True)

    import bench as B
    h = w = 256
    cfg = B.build_config(h, w)
    pipe = Pipeline(cfg)

    vshape = (448, 448, 448)
    layout = rowvol.RowLayout.for_shape(vshape)
    geo = jax.ShapeDtypeStruct((layout.geo_rows, 128), jnp.float32)
    key = jax.ShapeDtypeStruct((layout.key_rows, 128), jnp.int32)
    rv = rowvol.RowVolume(geo=geo, key=key,
                          origin=jax.ShapeDtypeStruct((3,), jnp.float32),
                          resolution=jax.ShapeDtypeStruct((), jnp.float32),
                          init_value=float(cfg.DATA.init_value))

    lowered = type(pipe)._exit_rows.lower(pipe, layout, rv)
    ana("exit_rows (donated)", lowered.compile())

    lowered2 = type(pipe)._peek_rows.lower(pipe, layout, rv)
    ana("peek_rows (no donate)", lowered2.compile())

    # key reconcile alone
    def keyrec(k):
        return rowvol._reconcile_key(k, layout)
    ana("key reconcile alone", jax.jit(keyrec).lower(key).compile())

    # geo reconcile pallas alone
    def georec(g):
        from segfusion_tpu.ops.pallas.shadow_build import \
            reconcile_slot_pallas_v
        return reconcile_slot_pallas_v(g, layout)
    ana("geo reconcile (pallas)", jax.jit(georec).lower(geo).compile())


if __name__ == "__main__":
    main()
