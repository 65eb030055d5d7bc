.PHONY: native test bench clean

native:
	g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread \
	    ganslate_tpu/native/dataops.cpp -o ganslate_tpu/native/libdataops.so

test:
	python -m pytest tests/ -q

bench:
	python bench.py

clean:
	rm -f ganslate_tpu/native/libdataops.so
