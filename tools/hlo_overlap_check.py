"""HLO-schedule evidence for the partitioned halo-overlap claim (VERDICT
r4 item 7).

``partition.py`` orders each level interior-first so the halo ppermutes
have no data dependency on the interior contraction; the claim that XLA's
latency-hiding scheduler actually overlaps them was previously an
argument.  This tool AOT-compiles ``make_partitioned_forward`` for a REAL
8-chip TPU target (``jax.experimental.topologies`` v5e:2x4 — no hardware
needed; the tunnel compiler lowers for the abstract topology) and checks
the optimized, scheduled HLO:

  * every ppermute lowers to an async collective-permute-start/-done pair;
  * between each start and its done, the scheduler places compute
    (fusions) — i.e. the exchange is in flight while the interior block
    runs.

Run:  python tools/hlo_overlap_check.py
Exit status 0 iff every matched pair has >= 1 fusion in flight.
"""

import re
import statistics
import sys

import numpy as np


def build_forward():
    import jax
    from jax.experimental import topologies
    from jax.sharding import Mesh
    from graphflow_tpu.core import prep
    from graphflow_tpu.core.graph import DenseGraph
    from graphflow_tpu.models.smp2d import SMP2DConfig, init_smp2d_params
    from graphflow_tpu.parallel import partition as pt

    jax.config.update("jax_default_device", jax.devices("cpu")[0])
    topo = topologies.get_topology_desc(topology_name="v5e:2x4",
                                        platform="tpu")
    r = np.random.default_rng(0)
    n, V = 24, 24
    edges = [(u, u + 1) for u in range(n - 1)] + [(0, 5), (3, 9), (7, 15)]
    feats = np.zeros((n, 4))
    feats[np.arange(n), r.integers(0, 4, n)] = 1
    g = DenseGraph.from_edges(n, 4, edges, feats)
    cfg = SMP2DConfig(max_nVertices=V, max_receptive_field=6, nLevels=2,
                      nChanels=8, nFeatures=4, nDepth=2)
    pg = prep.prepare_graph(g, 2, V, 6, 2)
    plan = pt.plan_partition(pg, 8)
    mesh = Mesh(np.array(topo.devices).reshape(8), ("graph",))
    params = init_smp2d_params(jax.random.PRNGKey(0), cfg)
    fwd = pt.make_partitioned_forward(cfg, plan, mesh, use_pallas=False)
    return fwd, params, pt.shard_inputs(plan)


def analyze(hlo_text: str):
    """Return per-pair (name, lines_between, fusions_between)."""
    lines = hlo_text.splitlines()
    starts, pairs = {}, []
    for i, l in enumerate(lines):
        m = re.match(r"\s*%([\w\.\-]+) = .*collective-permute-start\(", l)
        if m:
            starts[m.group(1)] = i
        m = re.search(r"collective-permute-done\(%([\w\.\-]+)\)", l)
        if m and m.group(1) in starts:
            si = starts[m.group(1)]
            seg = lines[si + 1:i]
            nf = sum(1 for s in seg if "fusion(" in s)
            pairs.append((m.group(1), i - si - 1, nf))
    return pairs


def main():
    fwd, params, inputs = build_forward()
    txt = fwd.lower(params, inputs).compile().as_text()
    n_start = txt.count("collective-permute-start")
    pairs = analyze(txt)
    gaps = [p[1] for p in pairs]
    fus = [p[2] for p in pairs]
    print(f"async collective-permute-start sites: {n_start}")
    print(f"start/done pairs matched in schedule order: {len(pairs)}")
    if pairs:
        print(f"scheduled lines in flight: min={min(gaps)} "
              f"median={statistics.median(gaps)} max={max(gaps)}")
        print(f"fusions in flight:         min={min(fus)} "
              f"median={statistics.median(fus)} max={max(fus)}")
    ok = bool(pairs) and all(f >= 1 for f in fus)
    print("OVERLAP:", "CONFIRMED" if ok else "NOT CONFIRMED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
