# Convenience targets mirroring the reference's src/Makefile surface
# (default / java / all / clean — ref: src/Makefile:16-21).

PY ?= python

default: native

native:
	$(PY) -c "from ssw_tpu.native import build; print('native:', build.load() is not None)"

java:
	cd bindings/java && javac ssw/*.java

all: native java

test:
	$(PY) -m pytest tests/ -q

bench:
	$(PY) bench.py

data:
	$(PY) tools/make_data.py

clean:
	rm -rf ssw_tpu/native/build bindings/java/ssw/*.class \
	       $(shell find . -name __pycache__ -type d 2>/dev/null)

.PHONY: default native java all test bench data clean
