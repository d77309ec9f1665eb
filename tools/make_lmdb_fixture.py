#!/usr/bin/env python3
"""Independent stock-SHAPED LMDB environment generator (fixture writer).

py-lmdb / liblmdb are not installable in this container (zero egress), so
this script plays the role of a stock writer for reader-generality tests:
it emulates the on-disk state liblmdb leaves after a SEQUENCE OF WRITE
TRANSACTIONS — the states graft's bulk EnvWriter never produces:

  * three committed txns with copy-on-write page turnover, numbered as
    the LAST of a longer history (254..256) so the free DB's INTEGERKEY
    u64 keys straddle the 0x100 byte boundary — 255 = FF 00.. sorts
    BEFORE 256 = 00 01.. by integer value but AFTER it by memcmp, the
    ordering trap mdb_cmp_cint exists for:
      txn 254 builds a tree; txn 255 rewrites it (tree-1 pages are freed
      into the FREE DB under key txnid=255); txn 256 rewrites again,
      REUSING txn-254's freed pages (liblmdb's allocator consumes
      old-enough freelist entries) and freeing tree-2's pages under
      txnid=256;
  * therefore: scattered page allocation (live tree interleaved with stale
    pages), stale-but-parseable old tree bytes, a stale-but-valid second
    meta page, a populated FREE DB (INTEGERKEY, MDB_IDL values), txnid > 1;
  * branch pages keep a REAL key in node 0 (stock split pages do; readers
    must never compare it — mdb_node_search starts at index 1);
  * configurable page size (4096 / 8192 — liblmdb uses the OS page size).

Layout facts from the PUBLIC OpenLDAP liblmdb sources (lmdb.h / mdb.c),
same documentation-level source as graft's Lmdb.scala — written from the
format spec, not from mdb.c code.

Usage: make_lmdb_fixture.py <outdir> <psize> <seed>
Writes <outdir>/data.mdb and <outdir>/fixture.json
  {"psize": N, "entries": {key: md5hex}, "deleted": [key...]}
"""
import json
import hashlib
import os
import random
import struct
import sys

PAGE_HDR = 16
NODE_SZ = 8
MAGIC = 0xBEEFC0DE
VERSION = 1
P_BRANCH, P_LEAF, P_OVERFLOW, P_META = 0x01, 0x02, 0x04, 0x08
F_BIGDATA = 0x01
P_INVALID = (1 << 64) - 1  # pgno ~0


def even(n):
    return (n + 1) & ~1


class Fixture:
    def __init__(self, psize, seed):
        self.psize = psize
        self.nodemax = ((psize - PAGE_HDR) // 2) & ~1
        self.rnd = random.Random(seed)
        self.pages = {}        # pgno -> bytes(psize) (or first page of chain)
        self.raw = {}          # pgno -> raw continuation bytes (no header)
        self.next_pg = 2
        self.free_db = {}      # txnid -> sorted list of free pgnos
        self.metas = {}        # meta page slot -> bytes

    # -------------------------------------------------- page-level emit
    def page_header(self, pgno, flags, lower, upper, pb_pages=None):
        if pb_pages is not None:
            lo_up = struct.pack("<I", pb_pages)
        else:
            lo_up = struct.pack("<HH", lower, upper)
        return struct.pack("<QHH", pgno, 0, flags) + lo_up

    def alloc(self, pool):
        """One page: prefer the reuse pool (shuffled old freed pages)."""
        if pool:
            return pool.pop()
        pg = self.next_pg
        self.next_pg += 1
        return pg

    def alloc_run(self, n):
        """Contiguous run (overflow chains) — always appended fresh, the
        simple case of mdb_page_alloc's contiguity search."""
        pg = self.next_pg
        self.next_pg += n
        return pg

    def write_overflow(self, value):
        npages = (PAGE_HDR + len(value) + self.psize - 1) // self.psize
        first = self.alloc_run(npages)
        head = bytearray(self.psize)
        head[:PAGE_HDR] = self.page_header(first, P_OVERFLOW, 0, 0, pb_pages=npages)
        chunk = min(len(value), self.psize - PAGE_HDR)
        head[PAGE_HDR:PAGE_HDR + chunk] = value[:chunk]
        self.pages[first] = bytes(head)
        off = chunk
        for j in range(1, npages):
            part = value[off:off + self.psize]
            self.raw[first + j] = part + b"\0" * (self.psize - len(part))
            off += self.psize
        return first, npages

    def build_leaf(self, items, pool):
        """items: [(key, value)] sorted; returns (pgno, stats-delta)."""
        pg = self.alloc(pool)
        buf = bytearray(self.psize)
        n, upper, overflow = 0, self.psize, 0
        for k, v in items:
            big = NODE_SZ + len(k) + len(v) > self.nodemax
            if big:
                ov, nov = self.write_overflow(v)
                body = struct.pack("<Q", ov)
                overflow += nov
            else:
                body = v
            nsz = even(NODE_SZ + len(k) + len(body))
            upper -= nsz
            struct.pack_into("<H", buf, PAGE_HDR + 2 * n, upper)
            struct.pack_into("<HHHH", buf, upper,
                             len(v) & 0xFFFF, (len(v) >> 16) & 0xFFFF,
                             F_BIGDATA if big else 0, len(k))
            buf[upper + NODE_SZ:upper + NODE_SZ + len(k)] = k
            buf[upper + NODE_SZ + len(k):upper + NODE_SZ + len(k) + len(body)] = body
            n += 1
        buf[:PAGE_HDR] = self.page_header(pg, P_LEAF, PAGE_HDR + 2 * n, upper)
        self.pages[pg] = bytes(buf)
        return pg, overflow

    def leaf_capacity_chunks(self, items):
        chunks, cur, used = [], [], PAGE_HDR
        for k, v in items:
            dlen = 8 if NODE_SZ + len(k) + len(v) > self.nodemax else len(v)
            cost = even(NODE_SZ + len(k) + dlen) + 2
            if cur and used + cost > self.psize:
                chunks.append(cur)
                cur, used = [], PAGE_HDR
            cur.append((k, v))
            used += cost
        if cur:
            chunks.append(cur)
        return chunks

    def build_branch_level(self, children, pool):
        """children: [(low_key, pgno)]; node 0 keeps its REAL key (stock
        behavior) — so capacity counts its key bytes too."""
        chunks, cur, used = [], [], PAGE_HDR
        for low, pg in children:
            cost = even(NODE_SZ + len(low)) + 2
            if cur and used + cost > self.psize:
                chunks.append(cur)
                cur, used = [], PAGE_HDR
            cur.append((low, pg))
            used += cost
        if cur:
            chunks.append(cur)
        if len(chunks) >= 2 and len(chunks[-1]) == 1:
            chunks[-1].insert(0, chunks[-2].pop())
        parents = []
        for chunk in chunks:
            pg = self.alloc(pool)
            buf = bytearray(self.psize)
            n, upper = 0, self.psize
            for low, child in chunk:
                nsz = even(NODE_SZ + len(low))
                upper -= nsz
                struct.pack_into("<H", buf, PAGE_HDR + 2 * n, upper)
                struct.pack_into("<HHHH", buf, upper,
                                 child & 0xFFFF, (child >> 16) & 0xFFFF,
                                 (child >> 32) & 0xFFFF, len(low))
                buf[upper + NODE_SZ:upper + NODE_SZ + len(low)] = low
                n += 1
            buf[:PAGE_HDR] = self.page_header(pg, P_BRANCH, PAGE_HDR + 2 * n, upper)
            self.pages[pg] = bytes(buf)
            parents.append((chunk[0][0], pg))
        return parents

    def build_tree(self, data, pool, presorted=None):
        """data: dict key->value. Returns (root, depth, stats).
        presorted: pre-ordered [(k, v)] for non-memcmp comparators
        (the free DB is MDB_INTEGERKEY: u64 txnids in INTEGER order,
        which diverges from byte order once txnids straddle 0x100)."""
        items = presorted if presorted is not None else sorted(data.items())
        if not items:
            return P_INVALID, 0, (0, 0, 0, 0)
        overflow = 0
        level = []
        for chunk in self.leaf_capacity_chunks(items):
            pg, ov = self.build_leaf(chunk, pool)
            overflow += ov
            level.append((chunk[0][0], pg))
        nleaf, nbranch, depth = len(level), 0, 1
        while len(level) > 1:
            level = self.build_branch_level(level, pool)
            nbranch += len(level)  # one branch page per parent entry
            depth += 1
        return level[0][1], depth, (nbranch, nleaf, overflow, len(items))

    # -------------------------------------------------- free DB
    def build_free_db(self, pool):
        """INTEGERKEY tree: key = txnid u64 (native LE), value = MDB_IDL
        (u64 count followed by pgnos, descending — mdb_midl layout)."""
        items = []
        for txnid in sorted(self.free_db):
            pgs = sorted(self.free_db[txnid], reverse=True)
            if not pgs:
                continue
            val = struct.pack("<Q", len(pgs)) + b"".join(
                struct.pack("<Q", p) for p in pgs)
            items.append((struct.pack("<Q", txnid), val))
        if not items:
            return P_INVALID, 0, (0, 0, 0, 0)
        return self.build_tree(None, pool, presorted=items)

    # -------------------------------------------------- meta pages
    def write_meta(self, slot, txnid, main, free, last_pg):
        buf = bytearray(self.psize)
        buf[:PAGE_HDR] = self.page_header(slot, P_META, 0, 0)
        m = PAGE_HDR
        struct.pack_into("<II", buf, m, MAGIC, VERSION)
        struct.pack_into("<QQ", buf, m + 8, 0, max(1 << 20, (last_pg + 1) * self.psize))
        froot, fdepth, (fb, fl, fo, fe) = free
        struct.pack_into("<IHH", buf, m + 24, self.psize, 0x08, fdepth)
        struct.pack_into("<QQQQQ", buf, m + 32, fb, fl, fo, fe, froot)
        mroot, mdepth, (mb, ml, mo, me) = main
        struct.pack_into("<IHH", buf, m + 72, 0, 0, mdepth)
        struct.pack_into("<QQQQQ", buf, m + 80, mb, ml, mo, me, mroot)
        struct.pack_into("<QQ", buf, m + 120, last_pg, txnid)
        self.metas[slot] = bytes(buf)


def rand_key(rnd):
    n = rnd.randint(5, 30)
    return bytes(rnd.choice(
        b"abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_-./:")
        for _ in range(n))


def rand_value(rnd, psize):
    r = rnd.random()
    if r < 0.60:
        n = rnd.randint(0, 200)           # small inline
    elif r < 0.85:
        n = rnd.randint(200, psize // 2)  # inline-or-overflow boundary zone
    else:
        n = rnd.randint(psize, 5 * psize)  # multi-page overflow chain
    return bytes(rnd.getrandbits(8) for _ in range(n))


def main(outdir, psize, seed):
    fx = Fixture(psize, seed)
    rnd = fx.rnd

    # ---- txn 1: initial tree --------------------------------------------
    data = {}
    for _ in range(120):
        data[rand_key(rnd)] = rand_value(rnd, psize)
    pages_before = set()
    root1 = fx.build_tree(dict(data), [])
    tree1_pages = set(fx.pages) - pages_before
    fx.write_meta(1, 254, root1, (P_INVALID, 0, (0, 0, 0, 0)), fx.next_pg - 1)

    # ---- txn 2: rewrite (COW): tree-1 pages freed under txnid 2 ---------
    for k in rnd.sample(sorted(data), 30):
        del data[k]
    deleted2 = []
    for _ in range(40):
        data[rand_key(rnd)] = rand_value(rnd, psize)
    snapshot2 = set(fx.pages)
    root2 = fx.build_tree(dict(data), [])   # all fresh pages
    tree2_pages = set(fx.pages) - snapshot2
    # single-page frees only (overflow chains freed too, but as runs —
    # keep the IDL single pages for simplicity: legal, liblmdb IDLs are
    # flat pgno lists either way)
    fx.free_db[255] = sorted(tree1_pages)
    free2 = fx.build_free_db([])
    fx.write_meta(0, 255, root2, free2, fx.next_pg - 1)

    # ---- txn 3: rewrite again, REUSING txn-1's freed single pages -------
    deleted = rnd.sample(sorted(data), 35)
    for k in deleted:
        del data[k]
    for _ in range(45):
        data[rand_key(rnd)] = rand_value(rnd, psize)
    # the allocator consumes (part of) freelist entry 2 — shuffled, so the
    # live tree lands scattered between stale txn-2 pages
    reusable = sorted(fx.free_db[255])
    rnd.shuffle(reusable)
    pool = reusable[: len(reusable) // 2]
    consumed = set(pool)
    root3 = fx.build_tree(dict(data), pool)
    consumed -= set(pool)  # what build_tree actually popped
    # entry 2 shrinks to its unconsumed remainder; tree-2's pages are
    # freed under txnid 3
    fx.free_db[255] = sorted(set(fx.free_db[255]) - consumed)
    fx.free_db[256] = sorted(tree2_pages)
    free3 = fx.build_free_db([])
    fx.write_meta(1, 256, root3, free3, fx.next_pg - 1)

    # ---- serialize ------------------------------------------------------
    last_pg = fx.next_pg - 1
    img = bytearray((last_pg + 1) * psize)
    img[0:psize] = fx.metas[0]
    img[psize:2 * psize] = fx.metas[1]
    for pg, b in fx.pages.items():
        img[pg * psize:(pg + 1) * psize] = b
    for pg, b in fx.raw.items():
        img[pg * psize:(pg + 1) * psize] = b
    os.makedirs(outdir, exist_ok=True)
    with open(os.path.join(outdir, "data.mdb"), "wb") as f:
        f.write(img)
    manifest = {
        "psize": psize,
        "entries": {k.decode("ascii"): hashlib.md5(v).hexdigest()
                    for k, v in data.items()},
        "deleted": [k.decode("ascii") for k in deleted if k not in data],
    }
    with open(os.path.join(outdir, "fixture.json"), "w") as f:
        json.dump(manifest, f)
    print(f"fixture: psize={psize} live={len(data)} last_pg={last_pg} "
          f"free_entries={sum(len(v) for v in fx.free_db.values())}")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
