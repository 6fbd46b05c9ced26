"""Bounded LRU counter used by the per-document dedup gate.

Semantics of /root/reference/internal/lru/cache.go:24-91: get returns the
current count (0 if absent), put inserts/updates and evicts the least
recently *inserted* entry beyond capacity.
"""

from __future__ import annotations

from collections import OrderedDict


class LRUCache:
    __slots__ = ("capacity", "_data")

    def __init__(self, capacity: int = 4096):
        self.capacity = capacity
        self._data: OrderedDict[str, int] = OrderedDict()

    def get(self, key: str) -> int:
        return self._data.get(key, 0)

    def put(self, key: str, value: int) -> None:
        if key in self._data:
            self._data[key] = value
            self._data.move_to_end(key)
        else:
            self._data[key] = value
            if len(self._data) > self.capacity:
                self._data.popitem(last=False)

    def __len__(self) -> int:
        return len(self._data)
