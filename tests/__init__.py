# Makes ``tests`` a real package so the cross-test helper imports
# (``from tests.test_markov import _simulate, _st`` etc.) resolve under
# any pytest import mode / invocation directory, not only
# ``python -m pytest`` from the repo root (ADVICE r4).
