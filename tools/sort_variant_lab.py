"""Lab: identify the reference binary's exact std::sort variant using the
link_scaffold singleton oracle (tools/sort_oracle_fuzz.py)."""

import sys

sys.setrecursionlimit(1000000)

S_T = 16


def make(lens):
    return [(int(l), i) for i, l in enumerate(lens)]


def cmp(a, b):
    return b[0] < a[0]


def insertion_sort(v, first, last):
    if first == last:
        return
    for i in range(first + 1, last):
        if cmp(v[i], v[first]):
            val = v[i]
            del v[i]
            v.insert(first, val)
        else:
            val = v[i]
            j = i
            while cmp(val, v[j - 1]):
                v[j] = v[j - 1]
                j -= 1
            v[j] = val


def unguarded_insertion(v, first, last):
    for i in range(first, last):
        val = v[i]
        j = i
        while cmp(val, v[j - 1]):
            v[j] = v[j - 1]
            j -= 1
        v[j] = val


def adjust_heap(v, first, hole, length, val):
    top = hole
    second = 2 * hole + 2
    while second < length:
        if cmp(v[first + second], v[first + second - 1]):
            second -= 1
        v[first + hole] = v[first + second]
        hole = second
        second = 2 * (second + 1)
    if second == length:
        v[first + hole] = v[first + second - 1]
        hole = second - 1
    parent = (hole - 1) // 2
    while hole > top and cmp(v[first + parent], val):
        v[first + hole] = v[first + parent]
        hole = parent
        parent = (hole - 1) // 2
    v[first + hole] = val


def heap_sort(v, first, last):
    length = last - first
    if length >= 2:
        parent = (length - 2) // 2
        while True:
            val = v[first + parent]
            adjust_heap(v, first, parent, length, val)
            if parent == 0:
                break
            parent -= 1
    while last - first > 1:
        last -= 1
        val = v[last]
        v[last] = v[first]
        adjust_heap(v, first, 0, last - first, val)


def lg(n):
    k = 0
    while n != 1:
        n >>= 1
        k += 1
    return k


# ---- variant A: GCC<=4.6 value-pivot ----
def median(a, b, c):
    if cmp(a, b):
        if cmp(b, c):
            return b
        elif cmp(a, c):
            return c
        else:
            return a
    elif cmp(a, c):
        return c
    elif cmp(b, c):
        return b
    else:
        return a


def unguarded_partition_val(v, first, last, pivot):
    while True:
        while cmp(v[first], pivot):
            first += 1
        last -= 1
        while cmp(pivot, v[last]):
            last -= 1
        if not (first < last):
            return first
        v[first], v[last] = v[last], v[first]
        first += 1


def introsort_A(v, first, last, depth):
    while last - first > S_T:
        if depth == 0:
            heap_sort(v, first, last)
            return
        depth -= 1
        piv = median(v[first], v[first + (last - first) // 2], v[last - 1])
        cut = unguarded_partition_val(v, first, last, piv)
        introsort_A(v, cut, last, depth)
        last = cut


def sort_A(lens):
    v = make(lens)
    n = len(v)
    if n:
        introsort_A(v, 0, n, lg(n) * 2)
        if n > S_T:
            insertion_sort(v, 0, S_T)
            unguarded_insertion(v, S_T, n)
        else:
            insertion_sort(v, 0, n)
    return [x[1] for x in v]


# ---- variant B: modern (>=4.7) pivot-at-first ----
def move_median_to_first(v, r, a, b, c):
    if cmp(v[a], v[b]):
        if cmp(v[b], v[c]):
            v[r], v[b] = v[b], v[r]
        elif cmp(v[a], v[c]):
            v[r], v[c] = v[c], v[r]
        else:
            v[r], v[a] = v[a], v[r]
    elif cmp(v[a], v[c]):
        v[r], v[a] = v[a], v[r]
    elif cmp(v[b], v[c]):
        v[r], v[c] = v[c], v[r]
    else:
        v[r], v[b] = v[b], v[r]


def unguarded_partition_iter(v, first, last, pivot_idx):
    while True:
        while cmp(v[first], v[pivot_idx]):
            first += 1
        last -= 1
        while cmp(v[pivot_idx], v[last]):
            last -= 1
        if not (first < last):
            return first
        v[first], v[last] = v[last], v[first]
        first += 1


def introsort_B(v, first, last, depth):
    while last - first > S_T:
        if depth == 0:
            heap_sort(v, first, last)
            return
        depth -= 1
        mid = first + (last - first) // 2
        move_median_to_first(v, first, first + 1, mid, last - 1)
        cut = unguarded_partition_iter(v, first + 1, last, first)
        introsort_B(v, cut, last, depth)
        last = cut


def sort_B(lens):
    v = make(lens)
    n = len(v)
    if n:
        introsort_B(v, 0, n, lg(n) * 2)
        if n > S_T:
            insertion_sort(v, 0, S_T)
            unguarded_insertion(v, S_T, n)
        else:
            insertion_sort(v, 0, n)
    return [x[1] for x in v]


VARIANTS = {"A_gcc44_value_pivot": sort_A, "B_modern_pivot_first": sort_B}


def main():
    sys.path.insert(0, "tools")
    from sort_oracle_fuzz import oracle_perm
    import numpy as np
    rng = np.random.default_rng(0)
    alive = dict(VARIANTS)
    for trial in range(60):
        n = int(rng.integers(2, 140))
        vals = (rng.integers(10, 10 + max(n // 3, 2), size=n) * 7
                + 10).tolist()
        ref = oracle_perm(vals)
        for name in list(alive):
            if alive[name](vals) != ref:
                print(f"trial {trial} n={n}: {name} ELIMINATED")
                del alive[name]
        if not alive:
            print("all variants eliminated; ref:", ref[:20])
            return
    print("surviving:", list(alive))


if __name__ == "__main__":
    main()
