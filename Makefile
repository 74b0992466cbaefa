# Build the native (C++) libraries in-tree. They are also auto-built on
# first use (morgana_tpu/_build.py); this target is for explicit builds.
CXX ?= g++
CXXFLAGS = -O3 -march=native -shared -fPIC -std=c++17 -pthread

native: morgana_tpu/vocoder/libworld_synth.so morgana_tpu/data/libbatch_io.so

morgana_tpu/vocoder/libworld_synth.so: morgana_tpu/vocoder/csrc/world_synth.cpp
	$(CXX) $(CXXFLAGS) $< -o $@

morgana_tpu/data/libbatch_io.so: morgana_tpu/data/csrc/batch_io.cpp
	$(CXX) $(CXXFLAGS) $< -o $@

test:
	python -m pytest tests/ -q

docs:
	python docs/build_docs.py

bench:
	python bench.py

.PHONY: native test bench docs
