#!/usr/bin/env bash
# Three-process devnet: bridge service + gRPC prover + node — the
# reference's full local topology (scripts/launch-pos-eigen-zeth-node.sh
# runs zeth as EL next to an external eigen-prover at PROVER_ADDR and a
# bridge service at BRIDGE_SERVICE_ADDR, src/config/env.rs:21,30-31).
#
# Process 1: the bridge HTTP service (settlement/bridge_mock.py) — the
#            custom settlement's REST backend (/sequence-batches,
#            /verify-batches, exit roots ...).
# Process 2: `eigen-zeth-tpu prover` serving
#            prover.v1.ProverService/ProverStream against the node's L2 RPC.
# Process 3: the CL-analog slot driver (sequencer/cl_driver.py) — plays
#            lighthouse's role, producing blocks through the engine API
#            (forkchoiceUpdatedV3/getPayloadV3/newPayloadV3) instead of
#            --auto-mine (the reference PoS topology's zeth EL +
#            lighthouse CL pairing).  Set SLOT_SECONDS=0 to fall back to
#            auto-mine.
# Process 4: `eigen-zeth-tpu run --settlement custom --prover-addr ...` —
#            the node, settling through process 1 and proving through
#            process 2.
set -euo pipefail
cd "$(dirname "$0")/.."

RPC_PORT=${RPC_PORT:-8546}
PROVER_PORT=${PROVER_PORT:-50061}
BRIDGE_PORT=${BRIDGE_PORT:-8001}
STARK_PROFILE=${STARK_PROFILE:-production}
SLOT_SECONDS=${SLOT_SECONDS:-2}

python -m eigen_zeth_tpu.settlement.bridge_mock --port "$BRIDGE_PORT" &
BRIDGE_PID=$!

python -m eigen_zeth_tpu prover \
  --port "$PROVER_PORT" \
  --l2-addr "http://127.0.0.1:${RPC_PORT}" \
  --stark-profile "$STARK_PROFILE" &
PROVER_PID=$!

CL_PID=""
AUTO_MINE_ARGS=(--auto-mine-interval 2.0)
if [ "$SLOT_SECONDS" != "0" ]; then
  # PoS-analog mode: external CL slot ticker, auto-mine off
  ( sleep 5; exec python -m eigen_zeth_tpu.sequencer.cl_driver \
      --el "http://127.0.0.1:${RPC_PORT}" --slot "$SLOT_SECONDS" ) &
  CL_PID=$!
  AUTO_MINE_ARGS=(--auto-mine-interval 0)
fi
trap 'kill $PROVER_PID $BRIDGE_PID $CL_PID 2>/dev/null || true' EXIT

# give the services a moment to bind
sleep 2

BRIDGE_SERVICE_ADDR="http://127.0.0.1:${BRIDGE_PORT}" \
python -m eigen_zeth_tpu run \
  --dev-fund \
  --database memory \
  --settlement custom \
  --rpc-port "$RPC_PORT" \
  "${AUTO_MINE_ARGS[@]}" \
  --prover-addr "http://127.0.0.1:${PROVER_PORT}" \
  "$@"
