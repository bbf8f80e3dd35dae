"""Monotonic id counter (reference: omniserve/utils/utils.py Counter)."""

import itertools


class Counter:
    def __init__(self, start: int = 0) -> None:
        self._it = itertools.count(start)

    def __next__(self) -> int:
        return next(self._it)

    def reset(self) -> None:
        self._it = itertools.count()
