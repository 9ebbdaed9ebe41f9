# Developer entry points. The test suite forces the CPU backend itself
# (tests/conftest.py); bench and train run on whatever JAX exposes (TPU here).

.PHONY: test test-fast test-core bench native clean-native smoke dryrun

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -m "not slow"

# sub-5-minute gate tier for time-boxed contexts (driver/CI/end-of-round):
# config + models + ops/losses + s2d algebra + step routing + one trainer e2e
test-core:
	python -m pytest tests/ -q -m core

bench:
	python bench.py

native:
	bash scripts/build_native.sh

clean-native:
	rm -f littlegan_tpu/data/_native/libloader.so

# tiny end-to-end CLI run on synthetic data (see .claude/skills/verify).
# Pinned to CPU: smoke must work (and fail fast, not hang) with the TPU
# tunnel down — the axon plugin is unset for this one target.
smoke:
	cd /tmp && mkdir -p lg_smoke && cd lg_smoke && \
	echo '{"batch_size":4,"image_dim":32,"init_dim":2,"noise_dim":16,"conv_filter":[48,32,24,16,8],"epoch":1,"freq_gen":2,"freq_test":4,"all_result_dir":"/tmp/lg_smoke/result","test_data_dir":"/tmp/lg_smoke/test-data","compute_dtype":"float32"}' > sample.config.json && \
	PYTHONPATH=$(CURDIR):$$PYTHONPATH env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
	python -m littlegan_tpu train smoke --debug --synthetic-data

dryrun:
	LITTLEGAN_VIRTUAL_DEVICES=8 python -c "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"

# full convergence campaign on the structured set (real chip, ~25 min; CAMPAIGN.md)
campaign:
	python scripts/make_structured_data.py /tmp/structured_celeba 6400 128
	python scripts/campaign.py parity100 --epochs 100 --eval-every 10
