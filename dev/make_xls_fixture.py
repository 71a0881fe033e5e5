#!/usr/bin/env python3
"""Dev-only generator for the legacy `.xls` (OLE2/BIFF8) test fixtures —
hand-built CFB container + BIFF8 records, no xlwt, so the fixture bytes are
reviewable from this script. Run from the repo root:

    python3 dev/make_xls_fixture.py

Writes:
  src/test/resources/fixtures/supplier_sheets.xls
      FAT-path stream (padded >= 4096 bytes), mirroring
      supplier_sheets.xlsx: Sheet1 (code, amount), Sheet2 (code, amount,
      note), one all-empty sheet the reader must drop. Cells exercise
      LABELSST, NUMBER and RK.
  src/test/resources/fixtures/xls_edge.xls
      mini-stream path (< 4096 bytes, read via the mini FAT), SST string
      split mid-string across a CONTINUE record (flag byte re-emitted),
      MULRK runs, BOOLERR, inline LABEL, FORMULA with cached number and
      with deferred STRING result, gap rows/cells.
"""
import struct

SECT = 512
ENDOFCHAIN = 0xFFFFFFFE
FREESECT = 0xFFFFFFFF
FATSECT = 0xFFFFFFFD


# ---- BIFF8 records

def rec(rid, data):
    return struct.pack('<HH', rid, len(data)) + data


def bof(dt):
    # vers=0x0600 (BIFF8), dt, build/year, history flags, lowest version
    return rec(0x0809, struct.pack('<HHHHII', 0x0600, dt, 0x0DBB, 0x07CC, 0, 0x0600))


EOF = rec(0x000A, b'')


def boundsheet(pos, name):
    nm = name.encode('ascii')
    return rec(0x0085, struct.pack('<IBBBB', pos, 0, 0, len(nm), 0) + nm)


def sst(strings):
    # all strings uncompressed UTF-16LE (fHighByte=1), no rich/ext
    data = struct.pack('<II', len(strings), len(strings))
    for s in strings:
        data += struct.pack('<HB', len(s), 1) + s.encode('utf-16-le')
    return rec(0x00FC, data)


def sst_with_continue(strings, split_string_index, split_chars):
    """SST where strings[split_string_index]'s char data is split after
    `split_chars` characters into a CONTINUE record (new flag byte)."""
    head = struct.pack('<II', len(strings), len(strings))
    for i, s in enumerate(strings[:split_string_index]):
        head += struct.pack('<HB', len(s), 1) + s.encode('utf-16-le')
    s = strings[split_string_index]
    head += struct.pack('<HB', len(s), 1) + s[:split_chars].encode('utf-16-le')
    cont = struct.pack('<B', 1) + s[split_chars:].encode('utf-16-le')
    for s2 in strings[split_string_index + 1:]:
        cont += struct.pack('<HB', len(s2), 1) + s2.encode('utf-16-le')
    return rec(0x00FC, head) + rec(0x003C, cont)


def labelsst(r, c, i):
    return rec(0x00FD, struct.pack('<HHHI', r, c, 0, i))


def number(r, c, v):
    return rec(0x0203, struct.pack('<HHHd', r, c, 0, v))


def rk_int(v):
    return ((v << 2) | 2) & 0xFFFFFFFF


def rk_num100(v):  # RK double/100 encoding: top 30 bits of double, bit0 set
    bits = struct.unpack('<Q', struct.pack('<d', v * 100.0))[0]
    return ((bits >> 32) & 0xFFFFFFFC) | 1


def rk(r, c, rkval):
    return rec(0x027E, struct.pack('<HHHI', r, c, 0, rkval))


def mulrk(r, c0, rkvals):
    body = struct.pack('<HH', r, c0)
    for v in rkvals:
        body += struct.pack('<HI', 0, v)
    body += struct.pack('<H', c0 + len(rkvals) - 1)
    return rec(0x00BD, body)


def boolerr(r, c, val, is_err=False):
    return rec(0x0205, struct.pack('<HHHBB', r, c, 0, val, 1 if is_err else 0))


def label(r, c, s):
    nm = s.encode('utf-16-le')
    return rec(0x0204, struct.pack('<HHHHB', r, c, 0, len(s), 1) + nm)


def formula_num(r, c, v):
    # cached numeric result, trivial token stream (ignored by the reader)
    return rec(0x0006, struct.pack('<HHHd', r, c, 0, v) + struct.pack('<HIH', 0, 0, 0))


def formula_str(r, c):
    cached = struct.pack('<BBIH', 0, 0, 0, 0xFFFF)  # string marker
    return rec(0x0006, struct.pack('<HHH', r, c, 0) + cached + struct.pack('<HIH', 0, 0, 0))


def string_rec(s):
    return rec(0x0207, struct.pack('<HB', len(s), 1) + s.encode('utf-16-le'))


def workbook_stream(sst_bytes, sheets):
    """sheets: list of (name, sheet_record_bytes). Returns stream bytes."""
    globals_head = bof(0x0005) + sst_bytes
    # boundsheet size depends only on name length — compute offsets in two passes
    def assemble(positions):
        g = globals_head
        for (name, _), pos in zip(sheets, positions):
            g += boundsheet(pos, name)
        return g + EOF
    dummy = assemble([0] * len(sheets))
    positions, acc = [], len(dummy)
    for _, body in sheets:
        positions.append(acc)
        acc += len(body)
    stream = assemble(positions)
    for _, body in sheets:
        stream += body
    return stream


# ---- CFB container

def dirent(name, objtype, start, size, root_child=FREESECT):
    nm = name.encode('utf-16-le') + b'\x00\x00'
    e = nm + b'\x00' * (64 - len(nm))
    e += struct.pack('<HBB', len(nm), objtype, 1)      # name len, type, color
    e += struct.pack('<iii', -1, -1, root_child if root_child != FREESECT else -1)
    e += b'\x00' * 16 + b'\x00' * 4                    # CLSID, state
    e += b'\x00' * 16                                  # timestamps
    e += struct.pack('<III', start, size, 0)           # start, size lo, size hi
    assert len(e) == 128, len(e)
    return e


def header(first_dir, num_fat, fat_sectors, first_minifat=ENDOFCHAIN, num_minifat=0):
    h = bytes([0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1])
    h += b'\x00' * 16                                  # CLSID
    h += struct.pack('<HHHH', 0x3E, 0x03, 0xFFFE, 9)   # minor, major, byte order, sector shift
    h += struct.pack('<H', 6)                          # mini sector shift
    h += b'\x00' * 6
    h += struct.pack('<III', 0, num_fat, first_dir)    # dir sectors (v3: 0), FAT count, first dir
    h += struct.pack('<II', 0, 4096)                   # transaction, mini cutoff
    h += struct.pack('<II', first_minifat, num_minifat)
    h += struct.pack('<II', ENDOFCHAIN, 0)             # first DIFAT sector, count
    difat = list(fat_sectors) + [FREESECT] * (109 - len(fat_sectors))
    h += struct.pack('<109I', *difat)
    assert len(h) == 512, len(h)
    return h


def pad_sect(b):
    return b + b'\x00' * (-len(b) % SECT)


def fat_sector(entries):
    e = list(entries) + [FREESECT] * (SECT // 4 - len(entries))
    return struct.pack(f'<{SECT // 4}I', *e)


def cfb_fat_path(stream):
    """Big-stream layout: workbook stream (>= 4096) straight in FAT sectors."""
    stream = stream + b'\x00' * max(0, 4096 - len(stream))   # force FAT path
    body = pad_sect(stream)
    n = len(body) // SECT                                    # workbook sectors 0..n-1
    dir_sector, fat_sect_id = n, n + 1
    fat = [i + 1 for i in range(n - 1)] + [ENDOFCHAIN]       # workbook chain
    fat += [ENDOFCHAIN]                                      # directory
    fat += [FATSECT]                                         # the FAT sector itself
    d = dirent('Root Entry', 5, ENDOFCHAIN, 0, root_child=1) \
        + dirent('Workbook', 2, 0, len(stream)) \
        + b'\x00' * 128 * 2
    return header(dir_sector, 1, [fat_sect_id]) + body + pad_sect(d) + fat_sector(fat)


def cfb_mini_path(stream):
    """Small-stream layout: workbook (< 4096) in the mini stream."""
    assert len(stream) < 4096
    mini = stream + b'\x00' * (-len(stream) % 64)
    n_mini = len(mini) // 64
    body = pad_sect(mini)
    n = len(body) // SECT                                    # ministream sectors 0..n-1
    minifat_id, dir_id, fat_id = n, n + 1, n + 2
    fat = [i + 1 for i in range(n - 1)] + [ENDOFCHAIN]       # ministream container chain
    fat += [ENDOFCHAIN, ENDOFCHAIN, FATSECT]                 # minifat, dir, fat
    minifat = [i + 1 for i in range(n_mini - 1)] + [ENDOFCHAIN]
    d = dirent('Root Entry', 5, 0, len(mini), root_child=1) \
        + dirent('Workbook', 2, 0, len(stream)) \
        + b'\x00' * 128 * 2
    return header(dir_id, 1, [fat_id], first_minifat=minifat_id, num_minifat=1) \
        + body + fat_sector(minifat) + pad_sect(d) + fat_sector(fat)


def main():
    out = 'src/test/resources/fixtures'

    # fixture 1: mirror of supplier_sheets.xlsx, FAT path
    strings = ['code', 'amount', 'A1', 'A2', 'note', 'B1', 'extra']
    sheet1 = bof(0x0010) \
        + labelsst(0, 0, 0) + labelsst(0, 1, 1) \
        + labelsst(1, 0, 2) + number(1, 1, 10.0) \
        + labelsst(2, 0, 3) + rk(2, 1, rk_int(20)) \
        + EOF
    sheet2 = bof(0x0010) \
        + labelsst(0, 0, 0) + labelsst(0, 1, 1) + labelsst(0, 2, 4) \
        + labelsst(1, 0, 5) + number(1, 1, 30.0) + labelsst(1, 2, 6) \
        + EOF
    empty = bof(0x0010) + EOF
    wb = workbook_stream(sst(strings),
                         [('Sheet1', sheet1), ('Sheet2', sheet2), ('Empty', empty)])
    with open(f'{out}/supplier_sheets.xls', 'wb') as f:
        f.write(cfb_fat_path(wb))

    # fixture 2: parser edge cases, mini-stream path
    long_tail = 'tail_' + 'x' * 40
    strings2 = ['h1', 'h2', 'h3', 'h4', 'split_' + long_tail]
    sheet = bof(0x0010) \
        + labelsst(0, 0, 0) + labelsst(0, 1, 1) + labelsst(0, 2, 2) + labelsst(0, 3, 3) \
        + labelsst(1, 0, 4) \
        + mulrk(1, 1, [rk_int(7), rk_num100(1.25), rk_int(-3)]) \
        + boolerr(3, 0, 1) + boolerr(3, 1, 0, is_err=True) \
        + label(3, 3, 'inline') \
        + formula_num(4, 0, 2.5) + formula_str(4, 1) + string_rec('fstr') \
        + EOF
    wb2 = workbook_stream(sst_with_continue(strings2, 4, 6), [('Edge', sheet)])
    assert len(wb2) < 4096, len(wb2)
    with open(f'{out}/xls_edge.xls', 'wb') as f:
        f.write(cfb_mini_path(wb2))

    print('wrote supplier_sheets.xls and xls_edge.xls')


if __name__ == '__main__':
    main()
