# Mirror of the reference's Makefile clean target (wipes render artifacts)
# plus local dev conveniences.
clean:
	rm -rf preds/ renders/ output/ results/

test:
	python -m pytest tests/ -q

bench:
	python bench.py

native:
	g++ -O3 -march=native -shared -fPIC -fopenmp \
	  gsattack/native/ply_native.cc -o gsattack/native/libgsattack_native.so

.PHONY: clean test bench native
