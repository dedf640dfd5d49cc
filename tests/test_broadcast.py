"""Per-worker broadcast cache: memoization, ref-key isolation, cap."""

from __future__ import annotations

from deed_ocr_ray.pipelines import broadcast


def test_cached_get_memoizes_and_isolates(ray_session):
    import ray

    broadcast._CACHE.clear()
    a = ray.put({"k": 1})
    b = ray.put({"k": 2})
    got_a = broadcast.cached_get(a)
    got_b = broadcast.cached_get(b)
    assert got_a == {"k": 1} and got_b == {"k": 2}
    # memoized: same object back, no re-fetch
    assert broadcast.cached_get(a) is got_a
    assert set(broadcast._CACHE) == {a.hex(), b.hex()}


def test_cached_get_cap_resets(ray_session):
    import ray

    broadcast._CACHE.clear()
    refs = [ray.put(i) for i in range(broadcast._MAX_ENTRIES + 2)]
    for r in refs:
        assert broadcast.cached_get(r) is not None
    # cap triggered at least one clear; the cache never exceeds the max
    assert len(broadcast._CACHE) <= broadcast._MAX_ENTRIES
    # values stay correct after the reset
    assert broadcast.cached_get(refs[0]) == 0
