#!/usr/bin/env python3
"""Evict a directory tree's pages from the OS page cache (cold-cache
bench protocol — PLANS.md round 9).

posix_fadvise(POSIX_FADV_DONTNEED) per file: no root needed, drops CLEAN
pages for exactly the measured data (a global drop_caches would also
evict sbt/Spark jars and unfairly cold-start the JVM side). Dirty pages
survive fadvise, so fsync first via os.sync() — the scale dirs are
written once and read many times, so in practice everything is clean.

Usage: dev/evict_cache.py <dir> [<dir> ...]
Prints one JSON line: bytes advised + files touched (verification that
the evict actually covered the data; pair with `free`/mincore spot
checks when establishing the protocol).
"""
import json
import os
import sys


def evict(root):
    total, files = 0, 0
    for dirpath, _dirnames, filenames in os.walk(root):
        for name in filenames:
            path = os.path.join(dirpath, name)
            try:
                fd = os.open(path, os.O_RDONLY)
            except OSError:
                continue
            try:
                size = os.fstat(fd).st_size
                os.posix_fadvise(fd, 0, 0, os.POSIX_FADV_DONTNEED)
                total += size
                files += 1
            finally:
                os.close(fd)
    return total, files


def main():
    if len(sys.argv) < 2:
        print(__doc__, file=sys.stderr)
        sys.exit(2)
    os.sync()  # fadvise cannot drop dirty pages
    grand_total, grand_files = 0, 0
    for root in sys.argv[1:]:
        t, f = evict(root)
        grand_total += t
        grand_files += f
    print(json.dumps({"evicted_bytes": grand_total, "files": grand_files,
                      "dirs": sys.argv[1:]}))


if __name__ == "__main__":
    main()
