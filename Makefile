# Test/bench entry points.
#
# Unit tests run on a virtual 8-device CPU mesh (no TPU needed). The env
# overrides bypass the axon TPU-claim sitecustomize, which otherwise adds
# ~30s of grant-claim latency to every python process.
TEST_ENV = PYTHONPATH= PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu

.PHONY: test test-quick bench native

test:
	$(TEST_ENV) python -m pytest tests/ -x -q

bench:
	python bench.py

native:
	python -m segfusion_tpu.native.build

# quick inner-loop tier: skips the slow e2e/parity tests (~3 min vs ~13)
test-quick:
	$(TEST_ENV) python -m pytest tests/ -x -q -m "not slow"
