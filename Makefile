# Developer entry points. Tests force CPU JAX (tests/conftest.py);
# bench targets run on whatever accelerator the environment provides.

.PHONY: test bench bench-suite bench-full serve serve-mock dryrun native tsan clean

test:
	python -m pytest tests/ -q

bench:
	python bench.py

bench-suite:
	python -m bench.suite

bench-full:
	python -m bench.suite --full

serve:
	python -m vectorlite_tpu.cli --port 3001

serve-mock:
	python -m vectorlite_tpu.cli --mock-embeddings --port 3001

dryrun:
	PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
	XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	python -c "import __graft_entry__ as g; g.dryrun_multichip(8); print('ok')"

native:
	rm -f vectorlite_tpu/native/build/libhnsw_builder.so
	python -c "from vectorlite_tpu import native; assert native.load()"

tsan:
	g++ -fsanitize=thread -O1 -g -std=c++17 -pthread \
	  vectorlite_tpu/native/tsan_harness.cpp -o /tmp/vl_tsan && /tmp/vl_tsan

clean:
	rm -rf vectorlite_tpu/native/build bench/report*.json
	find . -name __pycache__ -type d -exec rm -rf {} +
