"""AOT-compile the Llama-2-70B tp=8 decode step for a real TPU topology.

Multi-chip hardware is unavailable in this environment; this script
proves the tp=8 70B sharded program compiles for an actual v5e 2x4 TPU
topology (not just the virtual CPU mesh): `jax.jit(...).lower(...)` with
abstract args over a `topologies.get_topology_desc` mesh, then
`.compile()` through the PJRT AOT compiler. Prints the compiled HLO's
collective count and the per-chip argument bytes (VERDICT r2 item 8).

    PYTHONPATH=/root/.axon_site:/root/repo python scripts/aot_tp8_70b.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main() -> None:
    from jax.experimental import topologies

    from omniserve_tpu.config import ParallelConfig
    from omniserve_tpu.models.llama import (
        DecodeBatch,
        LlamaSpec,
        llama_forward,
        make_random_packed_params,
    )
    from omniserve_tpu.ops.paged_kv import make_kv_pool
    from omniserve_tpu.parallel.mesh import MODEL_AXIS, build_mesh
    from omniserve_tpu.parallel.sharding import make_sharded_forward

    tp = int(os.environ.get("AOT_TP", "8"))
    topo_name = os.environ.get("AOT_TOPOLOGY", "v5e:2x4")
    topo = topologies.get_topology_desc(
        topology_name=topo_name, platform="tpu"
    )
    assert len(topo.devices) == tp, (len(topo.devices), tp)
    mesh = build_mesh(
        ParallelConfig(tensor_parallel_size=tp), devices=topo.devices
    )

    # Llama-2-70B per-rank geometry at tp=8: 64 q / 8 kv heads -> 8 q /
    # 1 kv per rank; MLP 28672 -> 3584 per rank
    spec = LlamaSpec(
        num_layers=80, hidden=8192, intermediate=28672 // tp,
        num_q_heads=64 // tp, num_kv_heads=8 // tp, head_dim=128,
        vocab=32000, rope_base=10000.0, weight_bits=4, act_bits=8,
        kv_bits=4, kv_zeros=True, page_size=128,
        tp_axis=MODEL_AXIS,
    )
    batch = int(os.environ.get("AOT_BATCH", "96"))
    pages_per_seq = 13  # 1024 in + 512 out
    n_pages = batch * pages_per_seq + 1

    def abstract(tree):
        return jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), tree
        )

    # Shapes only: build the params/pool trees abstractly via a tiny eval
    # of the constructors under jax.eval_shape (no 70B of host memory).
    params_s = jax.eval_shape(
        lambda: make_random_packed_params(spec, seed=0, tp_size=tp)
    )
    # GLOBAL pool: kv heads sharded over the model axis (1 per rank)
    pool_s = jax.eval_shape(lambda: make_kv_pool(
        spec.num_layers, n_pages, spec.num_kv_heads * tp, spec.page_size,
        spec.head_dim, kv_bits=spec.kv_bits, kv_zeros=spec.kv_zeros,
    ))
    bd_s = abstract(DecodeBatch(
        token_ids=np.ones((batch,), np.int32),
        positions=np.full((batch,), 1024, np.int32),
        block_tables=np.zeros((batch, pages_per_seq), np.int32),
        streaming_block_tables=np.zeros((batch, 1), np.int32),
        active=np.ones((batch,), bool),
        new_page_ids=np.full((8,), -1, np.int32),
        refresh_selection=np.asarray(False),
        cached_page_idxes=np.full(
            (spec.num_layers, batch, 1, 1), -1, np.int32
        ),
    ))

    _, _, fn = make_sharded_forward(
        spec, mesh, is_prefill=False, params=params_s,
        retrieval_pool=pool_s, streaming_pool=None, return_raw=True,
    )

    def step(params, pool, bd):
        logits, pool, _, _ = fn(params, pool, None, bd)
        return jnp.argmax(logits, axis=-1), pool

    lowered = jax.jit(step).lower(params_s, pool_s, bd_s)
    compiled = lowered.compile()
    text = compiled.as_text()
    n_ar = text.count("all-reduce")
    n_ag = text.count("all-gather")
    n_rs = text.count("reduce-scatter")
    mem = compiled.memory_analysis()
    print(
        f"AOT tp={tp} Llama-2-70B decode step compiled for {topo_name}: "
        f"collectives all-reduce={n_ar} all-gather={n_ag} "
        f"reduce-scatter={n_rs}; per-chip args "
        f"{mem.argument_size_in_bytes / 2**30:.2f} GiB, temps "
        f"{mem.temp_size_in_bytes / 2**20:.0f} MiB"
    )


if __name__ == "__main__":
    main()
