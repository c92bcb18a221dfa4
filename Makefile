# Developer entry points.
.PHONY: native test bench wheel clean

native:
	g++ -O3 -std=c++17 -shared -fPIC -march=native \
	    -o native/libtpuss.so native/sais.cpp

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

wheel:
	python -m build

clean:
	rm -f native/libtpuss.so
	rm -rf build dist *.egg-info
