#!/usr/bin/env python3
"""Independent LMDB environment checker (third implementation).

Parses a data.mdb produced by graft.sinks.Lmdb with nothing but `struct`,
following the PUBLIC liblmdb on-disk layout (OpenLDAP lmdb.h / mdb.c):
meta page selection by txnid, B+tree walk, overflow chains, memcmp key
order. Prints entry count + stats and verifies:
  - magic/version/psize in both meta pages
  - the live meta's stat fields match a full page walk
  - keys iterate in strictly ascending memcmp order
  - every value's length matches its node's datasize field

Usage: check_lmdb.py <env_dir_or_data.mdb> [--dump-keys N]
"""
import struct, sys, os

PAGESIZE = 4096
HDRSZ = 16
MAGIC = 0xBEEFC0DE
P_BRANCH, P_LEAF, P_OVERFLOW, P_META = 0x01, 0x02, 0x04, 0x08
F_BIGDATA = 0x01


def page(buf, pgno):
    return buf[pgno * PAGESIZE:(pgno + 1) * PAGESIZE]


def parse_meta(p):
    pgno, _pad, flags, lower, upper = struct.unpack_from("<QHHHH", p, 0)
    assert flags & P_META, f"page {pgno}: not a meta page"
    m = HDRSZ
    magic, version = struct.unpack_from("<II", p, m)
    assert magic == MAGIC, f"bad magic {magic:#x}"
    assert version == 1, f"unsupported version {version}"
    addr, mapsize = struct.unpack_from("<QQ", p, m + 8)
    psize, fflags = struct.unpack_from("<IH", p, m + 24)
    assert psize == PAGESIZE, f"unsupported page size {psize}"
    (depth,) = struct.unpack_from("<H", p, m + 78)
    branch, leaf, overflow, entries, root = struct.unpack_from("<QQQQQ", p, m + 80)
    last_pg, txnid = struct.unpack_from("<QQ", p, m + 120)
    return dict(txnid=txnid, depth=depth, branch=branch, leaf=leaf,
                overflow=overflow, entries=entries, root=root,
                last_pg=last_pg, mapsize=mapsize)


def node_off(p, i):
    return struct.unpack_from("<H", p, HDRSZ + 2 * i)[0]


def num_keys(p):
    lower = struct.unpack_from("<H", p, 12)[0]
    return (lower - HDRSZ) // 2


def node(p, off):
    lo, hi, flags, ksize = struct.unpack_from("<HHHH", p, off)
    key = p[off + 8:off + 8 + ksize]
    return lo, hi, flags, ksize, key


def walk(buf, pgno, level):
    p = page(buf, pgno)
    flags = struct.unpack_from("<H", p, 10)[0]
    if level > 1:
        assert flags & P_BRANCH, f"page {pgno}: expected branch"
        for i in range(num_keys(p)):
            lo, hi, nflags, ksize, key = node(p, node_off(p, i))
            if i == 0:
                assert ksize == 0, f"branch {pgno}: first node ksize {ksize}"
            child = lo | (hi << 16) | (nflags << 32)
            yield from walk(buf, child, level - 1)
    else:
        assert flags & P_LEAF, f"page {pgno}: expected leaf"
        for i in range(num_keys(p)):
            off = node_off(p, i)
            lo, hi, nflags, ksize, key = node(p, off)
            dsize = lo | (hi << 16)
            if nflags & F_BIGDATA:
                (ovpgno,) = struct.unpack_from("<Q", p, off + 8 + ksize)
                ov = page(buf, ovpgno)
                ovflags = struct.unpack_from("<H", ov, 10)[0]
                assert ovflags & P_OVERFLOW, f"page {ovpgno}: expected overflow"
                (npages,) = struct.unpack_from("<I", ov, 12)
                raw = buf[ovpgno * PAGESIZE + HDRSZ:
                          ovpgno * PAGESIZE + HDRSZ + dsize]
                assert HDRSZ + dsize <= npages * PAGESIZE, "chain too short"
                value = raw
            else:
                value = p[off + 8 + ksize:off + 8 + ksize + dsize]
            yield bytes(key), bytes(value)


def count_pages(buf, last_pg):
    branch = leaf = overflow = entries = 0
    pgno = 2
    while pgno <= last_pg:
        p = page(buf, pgno)
        got_pgno, _pad, flags, lower, upper = struct.unpack_from("<QHHHH", p, 0)
        assert got_pgno == pgno, f"pgno field {got_pgno} at page {pgno}"
        if flags & P_OVERFLOW:
            (npages,) = struct.unpack_from("<I", p, 12)
            overflow += npages
            pgno += npages
        elif flags & P_BRANCH:
            assert num_keys(p) >= 2, f"branch {pgno}: {num_keys(p)} children"
            branch += 1
            pgno += 1
        elif flags & P_LEAF:
            entries += num_keys(p)
            leaf += 1
            pgno += 1
        else:
            raise AssertionError(f"page {pgno}: unknown flags {flags:#x}")
    return branch, leaf, overflow, entries


def main(path, dump=0):
    if os.path.isdir(path):
        path = os.path.join(path, "data.mdb")
    with open(path, "rb") as f:
        buf = f.read()
    m0, m1 = parse_meta(page(buf, 0)), parse_meta(page(buf, 1))
    meta = m1 if m1["txnid"] > m0["txnid"] else m0
    assert meta["mapsize"] >= len(buf), "mapsize smaller than file"

    branch, leaf, overflow, entries = count_pages(buf, meta["last_pg"])
    assert branch == meta["branch"], (branch, meta["branch"])
    assert leaf == meta["leaf"], (leaf, meta["leaf"])
    assert overflow == meta["overflow"], (overflow, meta["overflow"])
    assert entries == meta["entries"], (entries, meta["entries"])

    n = 0
    prev = None
    if meta["root"] != (1 << 64) - 1:
        for key, value in walk(buf, meta["root"], meta["depth"]):
            assert prev is None or prev < key, f"key order violated at {key!r}"
            prev = key
            n += 1
            if dump and n <= dump:
                print(f"  {key!r} -> {len(value)} bytes")
    assert n == meta["entries"], (n, meta["entries"])
    print(f"OK {path}: entries={n} depth={meta['depth']} "
          f"branch={branch} leaf={leaf} overflow={overflow} "
          f"file={len(buf)//PAGESIZE} pages")


if __name__ == "__main__":
    dump = 0
    if "--dump-keys" in sys.argv:
        i = sys.argv.index("--dump-keys")
        dump = int(sys.argv[i + 1])
        del sys.argv[i:i + 2]
    main(sys.argv[1], dump)
