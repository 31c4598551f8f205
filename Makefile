# fugu_tpu build/test entry points
.PHONY: all native test bench serve clean

all: native test

native:
	python -m fugu_tpu.native --build

test:
	python -m pytest tests/ -x -q

test-tpu:
	FUGU_TEST_TPU=1 python -m pytest tests/ -x -q

bench:
	python bench.py

serve:
	python -m fugu_tpu serve --port 3301

clean:
	rm -rf .bench_cache native/libfugu_native.so
	find . -name __pycache__ -type d -exec rm -rf {} +
