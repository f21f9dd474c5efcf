# eigen-zeth-tpu — developer targets (reference analog: /root/reference
# Makefile, whose targets wrap cargo + the scripts/ devnet stack; here
# they wrap python + the in-repo hermetic topology).

PY ?= python

help: ## Display this help screen
	@grep -h \
		-E '^[a-zA-Z_-]+:.*?## .*$$' $(MAKEFILE_LIST) | \
		awk 'BEGIN {FS = ":.*?## "}; {printf "\033[36m%-30s\033[0m %s\n", $$1, $$2}'

lint: ## Byte-compile every source + test file (the clippy/cargo-check role)
	@$(PY) -m compileall -q eigen_zeth_tpu tests scripts bench.py __graft_entry__.py
	@echo lint OK

test: ## Run the default test suite (slow markers deselected, pytest.ini)
	@$(PY) -m pytest tests/ -q

test-all: ## Run everything including the slow EC / large-trace tests
	@$(PY) -m pytest tests/ -q -m ''

bench: ## Run the benchmark harness (prints the headline JSON line)
	@$(PY) bench.py

bench-full: ## Benchmarks + per-kernel speed-of-light roofline reports
	@$(PY) bench.py --full

bench-warm: ## Pre-populate the XLA compile cache (no deadline; run once)
	@EZT_BENCH_DEADLINE=100000 EZT_BENCH_SECTION_BUDGET=100000 $(PY) bench.py

install: ## Install the package into the active environment
	@$(PY) -m pip install -e . --no-deps

native: ## Rebuild the C++ KV engine (native/libzethdb.so)
	@rm -f eigen_zeth_tpu/native/libzethdb.so
	@$(PY) -c "from eigen_zeth_tpu.native import zethdb; zethdb.load(); print('libzethdb.so rebuilt')"

init-genesis: ## Initialize the rollup KV genesis record (InitCmd analog)
	@$(PY) -m eigen_zeth_tpu init --database file --db-path tmp/zeth.db

node: ## Launch the single-process dev node (node + in-process prover)
	@bash scripts/launch-dev-node.sh

two-process: ## Launch node + gRPC prover as separate OS processes
	@bash scripts/launch-two-process-node.sh

devnet: ## Launch the 3-process devnet: bridge + prover + node
	@bash scripts/launch-devnet.sh

clean: ## Remove devnet/test data (the clean_*_network_data role)
	@rm -rf tmp/ .pytest_cache
	@find . -name __pycache__ -type d -prune -exec rm -rf {} +

.PHONY: help lint test test-all bench bench-full install native \
	init-genesis node two-process devnet clean
