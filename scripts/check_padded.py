"""TPU validation of the padded M-machine pipeline (run on real TPU).

Byte-equality of the padded layered FRI prover and the M-machine STARK
chunk prover against the host reference paths, at real (but small-ish)
sizes.  The CPU test mesh cannot run these device programs (XLA CPU's
compile time explodes on Poseidon graphs — tests/test_padded_pipeline.py
docnote), so this script is the device-path correctness gate; bench.py's
sections additionally verify every measured artifact.

Usage:  python scripts/check_padded.py  [--size-log2 20]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from eigen_zeth_tpu.models import fri, stark
from eigen_zeth_tpu.models.transcript import Transcript
from eigen_zeth_tpu.ops import goldilocks as gl
from eigen_zeth_tpu.ops import ntt as nttm


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size-log2", type=int, default=20)
    ap.add_argument("--arity", type=int, default=8)
    args = ap.parse_args()

    rng = np.random.default_rng(0xC0FFEE)
    params = fri.FriParams(arity=args.arity, num_queries=8)
    m = 1 << args.size_log2
    coeffs = gl.random_gf((m // params.blowup,), rng)
    evals = nttm.lde(coeffs, params.blowup, gl.MULTIPLICATIVE_GENERATOR)

    t0 = time.time()
    t_dev = Transcript("chk")
    dev = fri._fri_prove_padded(evals, gl.MULTIPLICATIVE_GENERATOR, t_dev, params)
    print(f"padded FRI 2^{args.size_log2}: {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    t_host = Transcript("chk")
    host = fri.fri_prove(evals, gl.MULTIPLICATIVE_GENERATOR, t_host, params,
                         fused=False)
    print(f"host FRI: {time.time()-t0:.1f}s", flush=True)

    assert dev.proof == host.proof, "PADDED/HOST PROOF MISMATCH"
    assert t_dev.export_state() == t_host.export_state(), "transcript drift"
    ok, _ = fri.fri_verify(dev.proof, Transcript("chk"), params)
    assert ok, "verification failed"
    print("FRI padded == host, verified OK", flush=True)

    # chunk STARK: M-machine vs forced-numpy pipeline
    import os

    n = 1 << (args.size_log2 - 4)
    data = [int(x) for x in rng.integers(0, gl.P, size=n - 2, dtype=np.uint64)]
    sp = stark.StarkParams(fri_arity=args.arity)
    t0 = time.time()
    p_dev = stark.prove_chunk(data, iv=99, params=sp)
    print(f"M-machine chunk 2^{args.size_log2 - 4} rows: {time.time()-t0:.1f}s",
          flush=True)
    os.environ["EZT_FORCE_NP_STARK"] = "1"
    t0 = time.time()
    p_np = stark.prove_chunk(data, iv=99, params=sp)
    del os.environ["EZT_FORCE_NP_STARK"]
    print(f"numpy chunk: {time.time()-t0:.1f}s", flush=True)
    assert p_dev == p_np, "STARK M-machine/numpy mismatch"
    assert stark.verify_chunk(p_dev, sp), "chunk verify failed"
    print("STARK padded == numpy, verified OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
