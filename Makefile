.PHONY: test test-fast bench native clean

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -m "not slow"

bench:
	python bench.py

native:
	sh native/build.sh

clean:
	rm -rf output/ native/libsdt_dataio.so
