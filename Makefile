# Pre-commit gates. BOTH round-3 regressions (crashed multichip dryrun,
# failing 2-process consensus test) shipped because neither gate was
# re-run after the final commits — run `make verify` before EVERY commit.
#
# verify      : full pytest suite (CPU, 8 virtual devices, f64) + the
#               driver's multichip dryrun gate on 8 virtual CPU devices.
#               No TPU needed; ~12 min cold, ~3 min warm (.jax_cache).
# verify-tpu  : additionally smoke the real-chip bench (one JSON line).
#               Requires the tunnelled TPU to be free (single-tenant —
#               never run while another TPU process is alive).

PY := python

.PHONY: verify verify-tpu test dryrun bench-smoke

verify: test dryrun

test:
	$(PY) scripts/test_shards.py 2

# Single-process fallback (the sharded runner is the default: ~519 s
# -> ~5 min wall on this 2-core box, and it bounds the per-process
# native-state growth behind the old late-suite segfault).
test-serial:
	$(PY) -m pytest tests/ -q

dryrun:
	$(PY) -c "import os; \
	os.environ['XLA_FLAGS'] = os.environ.get('XLA_FLAGS','') + ' --xla_force_host_platform_device_count=8'; \
	import jax; jax.config.update('jax_platforms', 'cpu'); \
	import __graft_entry__ as g; g.dryrun_multichip(8); print('dryrun_multichip(8) ok')"

verify-tpu: verify bench-smoke

bench-smoke:
	timeout 1200 $(PY) bench.py
