#!/usr/bin/env bash
# Launch a hermetic dev node (sequencer + prover + mock settlement + RPC).
# The reference's equivalent stack needs a reth L1 devnet, lighthouse, and
# the external prover (scripts/launch-pos-eigen-zeth-node.sh there); this
# framework runs the whole pipeline in one process.
set -euo pipefail
cd "$(dirname "$0")/.."

DB=${DB:-memory}
PORT=${PORT:-8546}

exec python -m eigen_zeth_tpu run \
  --dev-fund \
  --database "$DB" \
  --settlement mock \
  --rpc-port "$PORT" \
  --tx-filter-conf configs/custom_node_config.toml \
  "$@"
