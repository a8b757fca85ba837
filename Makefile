# Convenience targets. The native library also auto-builds on first use
# (evr_tpu/native/loader.py).

.PHONY: all native test bench clean

all: native

native:
	g++ -O3 -std=c++17 -shared -fPIC -pthread \
	    evr_tpu/native/src/image_loader.cc \
	    -o evr_tpu/native/libevr_native.so -ljpeg

test:
	python -m pytest tests/ -q

bench:
	python bench.py

clean:
	rm -f evr_tpu/native/libevr_native.so
	find . -name __pycache__ -type d -exec rm -rf {} +
