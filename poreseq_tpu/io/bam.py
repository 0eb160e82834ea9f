"""Pure-Python BAM reader/writer (pysam is not available in this image).

Implements the subset of pysam the reference loader uses
(/root/reference/poreseq/LoadData.py:81-137): AlignmentFile(fetch),
references, record.query_name / is_reverse / cigar / get_aligned_pairs /
get_overlap.  Files are BGZF (multi-member gzip) per the SAM/BAM spec;
fetch() is a linear scan (no .bai index needed at our scales).

The writer emits spec-compliant BGZF BAM for the synthetic-data pipeline and
round-trip tests.
"""

from __future__ import annotations

import gzip
import struct
import zlib

# cigar op codes: MIDNSHP=X
CMATCH, CINS, CDEL, CREF_SKIP, CSOFT_CLIP, CHARD_CLIP, CPAD, CEQUAL, CDIFF = range(9)
_QUERY_OPS = {CMATCH, CINS, CSOFT_CLIP, CEQUAL, CDIFF}
_REF_OPS = {CMATCH, CDEL, CREF_SKIP, CEQUAL, CDIFF}
_ALIGNED_OPS = {CMATCH, CEQUAL, CDIFF}

_SEQ_CODES = "=ACMGRSVTWYHKDBN"
_SEQ_LOOKUP = {c: i for i, c in enumerate(_SEQ_CODES)}


class BamRecord:
    __slots__ = (
        "query_name", "flag", "ref_id", "pos", "mapq", "cigar", "seq", "qual",
        "reference_name",
    )

    def __init__(self):
        self.query_name = ""
        self.flag = 0
        self.ref_id = -1
        self.pos = -1
        self.mapq = 0
        self.cigar = []  # list of (op, length)
        self.seq = ""
        self.qual = b""
        self.reference_name = None

    @property
    def is_reverse(self) -> bool:
        return bool(self.flag & 16)

    @property
    def is_unmapped(self) -> bool:
        return bool(self.flag & 4)

    def reference_end(self) -> int:
        return self.pos + sum(l for op, l in self.cigar if op in _REF_OPS)

    def get_aligned_pairs(self):
        """pysam-compatible (qpos, rpos) pairs including gaps as None."""
        pairs = []
        q = 0
        r = self.pos
        for op, ln in self.cigar:
            if op in _ALIGNED_OPS:
                for _ in range(ln):
                    pairs.append((q, r))
                    q += 1
                    r += 1
            elif op in (CINS, CSOFT_CLIP):
                for _ in range(ln):
                    pairs.append((q, None))
                    q += 1
            elif op in (CDEL, CREF_SKIP):
                for _ in range(ln):
                    pairs.append((None, r))
                    r += 1
            # H/P consume nothing
        return pairs

    def get_overlap(self, start: int, end: int) -> int:
        """Number of aligned (M/=/X) bases overlapping [start, end)."""
        n = 0
        r = self.pos
        for op, ln in self.cigar:
            if op in _ALIGNED_OPS:
                lo = max(r, start)
                hi = min(r + ln, end)
                if hi > lo:
                    n += hi - lo
                r += ln
            elif op in _REF_OPS:
                r += ln
        return n


class AlignmentFile:
    """Read-only BAM file with linear-scan fetch."""

    def __init__(self, path: str, mode: str = "rb"):
        raw = open(path, "rb").read()
        data = gzip.decompress(raw)  # BGZF = concatenated gzip members
        if data[:4] != b"BAM\x01":
            raise ValueError("not a BAM file")
        off = 4
        (l_text,) = struct.unpack_from("<i", data, off)
        off += 4 + l_text
        (n_ref,) = struct.unpack_from("<i", data, off)
        off += 4
        self.references = []
        self.lengths = []
        for _ in range(n_ref):
            (l_name,) = struct.unpack_from("<i", data, off)
            off += 4
            name = data[off : off + l_name - 1].decode()
            off += l_name
            (l_ref,) = struct.unpack_from("<i", data, off)
            off += 4
            self.references.append(name)
            self.lengths.append(l_ref)
        self.nreferences = n_ref
        self._records = []
        n = len(data)
        while off < n:
            (block_size,) = struct.unpack_from("<i", data, off)
            off += 4
            rec = self._parse(data, off)
            self._records.append(rec)
            off += block_size

    def _parse(self, data: bytes, off: int) -> BamRecord:
        (ref_id, pos, l_rn, mapq, _bin, n_cig, flag, l_seq, _nr, _np,
         _tlen) = struct.unpack_from("<iiBBHHHiiii", data, off)
        rec = BamRecord()
        rec.ref_id = ref_id
        rec.pos = pos
        rec.mapq = mapq
        rec.flag = flag
        p = off + 32
        rec.query_name = data[p : p + l_rn - 1].decode()
        p += l_rn
        cig = struct.unpack_from("<%dI" % n_cig, data, p)
        rec.cigar = [(c & 0xF, c >> 4) for c in cig]
        p += 4 * n_cig
        nb = (l_seq + 1) // 2
        seq = []
        for i in range(l_seq):
            b = data[p + i // 2]
            code = (b >> 4) if i % 2 == 0 else (b & 0xF)
            seq.append(_SEQ_CODES[code])
        rec.seq = "".join(seq)
        p += nb
        rec.qual = data[p : p + l_seq]
        if 0 <= ref_id < len(self.references):
            rec.reference_name = self.references[ref_id]
        return rec

    def fetch(self, reference=None, start=None, end=None):
        for rec in self._records:
            if rec.is_unmapped:
                continue
            if reference is not None and rec.reference_name != reference:
                continue
            if start is not None and rec.reference_end() <= start:
                continue
            if end is not None and rec.pos >= end:
                continue
            yield rec

    def close(self):
        pass


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------


def _bgzf_block(payload: bytes) -> bytes:
    comp = zlib.compressobj(6, zlib.DEFLATED, -15)
    cdata = comp.compress(payload) + comp.flush()
    bsize = len(cdata) + 25 + 1
    header = (
        b"\x1f\x8b\x08\x04\x00\x00\x00\x00\x00\xff"
        + struct.pack("<H", 6)
        + b"BC"
        + struct.pack("<HH", 2, bsize - 1)
    )
    footer = struct.pack("<II", zlib.crc32(payload) & 0xFFFFFFFF, len(payload))
    return header + cdata + footer


_BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000"
)


def write_bam(path: str, references: list[tuple[str, int]], records: list[dict]):
    """Write a BAM file.  Each record dict: query_name, flag, ref_id, pos,
    mapq, cigar [(op,len)], seq (str)."""
    body = b"BAM\x01"
    text = b""
    body += struct.pack("<i", len(text)) + text
    body += struct.pack("<i", len(references))
    for name, ln in references:
        nb = name.encode() + b"\x00"
        body += struct.pack("<i", len(nb)) + nb + struct.pack("<i", ln)

    for r in records:
        name = r["query_name"].encode() + b"\x00"
        cig = b"".join(
            struct.pack("<I", (ln << 4) | op) for op, ln in r["cigar"]
        )
        seq = r.get("seq", "")
        l_seq = len(seq)
        sb = bytearray((l_seq + 1) // 2)
        for i, c in enumerate(seq):
            code = _SEQ_LOOKUP.get(c, 15)
            if i % 2 == 0:
                sb[i // 2] |= code << 4
            else:
                sb[i // 2] |= code
        qual = b"\xff" * l_seq
        rec = struct.pack(
            "<iiBBHHHiiii",
            r["ref_id"], r["pos"], len(name), r.get("mapq", 60),
            0, len(r["cigar"]), r.get("flag", 0), l_seq, -1, -1, 0,
        ) + name + cig + bytes(sb) + qual
        body += struct.pack("<i", len(rec)) + rec

    with open(path, "wb") as f:
        # split into <=60KB BGZF blocks
        for i in range(0, len(body), 60000):
            f.write(_bgzf_block(body[i : i + 60000]))
        f.write(_BGZF_EOF)
