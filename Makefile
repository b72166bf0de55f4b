# Top-level convenience targets (the reference's Makefile builds its 8 C++
# binaries; here the crypto is JAX — only the native runtime needs a build).

.PHONY: all native test test-core bench sizes clean

all: native

native:                       # C++ artifact server + serde (runtime/)
	$(MAKE) -C ppqsflhe_tpu/runtime all

test:                         # full suite (CPU, virtual 8-device mesh)
	PALLAS_AXON_POOL_IPS= python -m pytest tests/ -q

test-core:                    # <3 min core lane
	PALLAS_AXON_POOL_IPS= python -m pytest tests/ -q -m "not slow"

bench:                        # headline TPU bench (one JSON line)
	python bench.py

sizes:                        # wire/artifact size table (CPU)
	PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python bench_sizes.py

clean:
	rm -rf ppqsflhe_tpu/runtime/bin ppqsflhe_tpu/runtime/lib
