"""Minimal, dependency-free FITS reader/writer.

The reference package (Nemo) uses astropy.io.fits for all of its map and
catalog I/O (e.g. ``nemo/maps.py:2371`` ``saveFITS``, ``nemo/catalogs.py:492``
``writeCatalog``).  astropy is not part of this framework's runtime, so we
implement the subset of FITS that the pipeline needs natively:

* image HDUs (primary + IMAGE extensions), BITPIX 8/16/32/64/-32/-64,
  BSCALE/BZERO, 2-d and 3-d arrays;
* binary tables (``XTENSION = 'BINTABLE'``) with column types
  L (logical), B, I, J, K (ints), E, D (floats) and A (strings);
* multi-extension files (MEFs), extensions addressed by EXTNAME;
* transparent gzip support for ``*.gz`` paths.

Compressed image HDUs (RICE/PLIO tile compression, used by the reference via
``CompImageHDU``) are intentionally *not* implemented - callers that pass a
``compressionType`` get a float32/uint8 downcast in a plain image HDU instead,
which preserves the lossy-compression byte savings the reference was after
without the cfitsio dependency.

All I/O is host-side numpy; device code never touches this module.
"""

import gzip
import os

import numpy as np

BLOCK = 2880

_BITPIX_TO_DTYPE = {
    8: np.dtype(">u1"),
    16: np.dtype(">i2"),
    32: np.dtype(">i4"),
    64: np.dtype(">i8"),
    -32: np.dtype(">f4"),
    -64: np.dtype(">f8"),
}
_DTYPE_TO_BITPIX = {
    "uint8": 8,
    "int8": 16,
    "bool": 8,
    "int16": 16,
    "uint16": 32,
    "int32": 32,
    "uint32": 64,
    "int64": 64,
    "float32": -32,
    "float64": -64,
}

# Binary-table TFORM codes <-> numpy
_TFORM_TO_DTYPE = {
    "L": np.dtype(">u1"),
    "B": np.dtype(">u1"),
    "I": np.dtype(">i2"),
    "J": np.dtype(">i4"),
    "K": np.dtype(">i8"),
    "E": np.dtype(">f4"),
    "D": np.dtype(">f8"),
}


class Header(dict):
    """An ordered FITS header: a dict plus COMMENT/HISTORY passthrough.

    Keys are upper-case strings; values are python ints/floats/bools/strings.
    """

    def copy(self):
        new = Header()
        new.update(self)
        return new


class HDU:
    """One header-data unit: ``header`` (Header), ``data`` (ndarray or
    dict-of-columns for tables), ``name`` (EXTNAME or '' for primary),
    ``is_table`` flag."""

    def __init__(self, data=None, header=None, name=""):
        self.data = data
        self.header = header if header is not None else Header()
        self.name = name
        self.is_table = isinstance(data, dict)


def _parse_value(raw):
    raw = raw.strip()
    if raw == "":
        return None
    if raw.startswith("'"):
        # string: ends at closing quote ('' escapes ')
        end = 1
        out = []
        while end < len(raw):
            if raw[end] == "'":
                if end + 1 < len(raw) and raw[end + 1] == "'":
                    out.append("'")
                    end += 2
                    continue
                break
            out.append(raw[end])
            end += 1
        return "".join(out).rstrip()
    if raw == "T":
        return True
    if raw == "F":
        return False
    try:
        return int(raw)
    except ValueError:
        pass
    try:
        return float(raw.replace("D", "E").replace("d", "e"))
    except ValueError:
        return raw


def _read_header(fileobj):
    """Read header blocks from current position; returns Header or None at EOF."""
    header = Header()
    cards = b""
    while True:
        block = fileobj.read(BLOCK)
        if len(block) == 0 and len(cards) == 0:
            return None
        if len(block) < BLOCK:
            raise IOError("Truncated FITS header block")
        cards += block
        if b"END     " in block or block.rstrip().endswith(b"END"):
            # Check card-aligned END
            found_end = False
            for i in range(0, len(cards), 80):
                card = cards[i:i + 80].decode("ascii", errors="replace")
                key = card[:8].strip()
                if key == "END":
                    found_end = True
                    break
                if key in ("COMMENT", "HISTORY", ""):
                    continue
                if card[8:10] == "= ":
                    val = card[10:]
                    if "/" in val:
                        # careful: '/' inside strings
                        if val.strip().startswith("'"):
                            # find closing quote then slash
                            body = val
                            q = body.find("'", body.find("'") + 1)
                            while q != -1 and q + 1 < len(body) and body[q + 1] == "'":
                                q = body.find("'", q + 2)
                            comment_pos = body.find("/", q if q != -1 else 0)
                        else:
                            comment_pos = val.find("/")
                        if comment_pos != -1:
                            val = val[:comment_pos]
                    header[key] = _parse_value(val)
            if found_end:
                return header


def _data_size_bytes(header):
    if header.get("NAXIS", 0) == 0:
        return 0
    nbytes = abs(int(header["BITPIX"])) // 8
    for i in range(1, int(header["NAXIS"]) + 1):
        nbytes *= int(header["NAXIS%d" % i])
    nbytes *= int(header.get("GCOUNT", 1))
    nbytes += int(header.get("PCOUNT", 0))
    return nbytes


def _padded(n):
    return ((n + BLOCK - 1) // BLOCK) * BLOCK


def _read_image_data(fileobj, header):
    nbytes = _data_size_bytes(header)
    if nbytes == 0:
        return None
    raw = fileobj.read(_padded(nbytes))[:nbytes]
    dtype = _BITPIX_TO_DTYPE[int(header["BITPIX"])]
    shape = tuple(int(header["NAXIS%d" % i])
                  for i in range(int(header["NAXIS"]), 0, -1))
    arr = np.frombuffer(raw, dtype=dtype).reshape(shape)
    bscale = header.get("BSCALE", 1)
    bzero = header.get("BZERO", 0)
    if bscale != 1 or bzero != 0:
        arr = arr.astype(np.float64) * bscale + bzero
    else:
        arr = arr.astype(dtype.newbyteorder("="))
    return arr


def _parse_tform(tform):
    """Return (repeat, code)."""
    i = 0
    while i < len(tform) and tform[i].isdigit():
        i += 1
    repeat = int(tform[:i]) if i > 0 else 1
    code = tform[i].upper()
    return repeat, code


def _read_table_data(fileobj, header):
    nrows = int(header["NAXIS2"])
    rowbytes = int(header["NAXIS1"])
    ncols = int(header["TFIELDS"])
    total = nrows * rowbytes + int(header.get("PCOUNT", 0))
    raw = fileobj.read(_padded(total))[:nrows * rowbytes]
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(nrows, rowbytes)

    cols = {}
    offset = 0
    for c in range(1, ncols + 1):
        name = str(header.get("TTYPE%d" % c, "col%d" % c)).strip()
        repeat, code = _parse_tform(str(header["TFORM%d" % c]).strip())
        if code == "A":
            width = repeat
            chunk = rows[:, offset:offset + width]
            vals = np.array([bytes(r).decode("ascii", errors="replace").rstrip()
                             for r in chunk])
            cols[name] = vals
            offset += width
        else:
            dt = _TFORM_TO_DTYPE[code]
            width = dt.itemsize * repeat
            chunk = rows[:, offset:offset + width].copy()
            vals = chunk.view(dt).reshape(nrows, repeat)
            if repeat == 1:
                vals = vals[:, 0]
            if code == "L":
                vals = vals == ord("T")
            else:
                vals = vals.astype(dt.newbyteorder("="))
            cols[name] = vals
            offset += width
    return cols


def _open_maybe_gzip(path, mode):
    if str(path).endswith(".gz"):
        return gzip.open(path, mode)
    return open(path, mode)


def read(path):
    """Read a FITS file; returns a list of :class:`HDU`."""
    hdus = []
    with _open_maybe_gzip(path, "rb") as f:
        while True:
            header = _read_header(f)
            if header is None:
                break
            xtension = str(header.get("XTENSION", "")).strip()
            if xtension == "BINTABLE":
                data = _read_table_data(f, header)
                hdu = HDU(data=data, header=header,
                          name=str(header.get("EXTNAME", "")).strip())
                hdu.is_table = True
            else:
                data = _read_image_data(f, header)
                hdu = HDU(data=data, header=header,
                          name=str(header.get("EXTNAME", "")).strip())
            hdus.append(hdu)
    return hdus


def read_image(path, ext=None):
    """Read the first image HDU with data (or the named/indexed extension).

    Returns (data, header).
    """
    hdus = read(path)
    if ext is not None:
        for i, h in enumerate(hdus):
            if (isinstance(ext, int) and i == ext) or \
               (isinstance(ext, str) and h.name.upper() == ext.upper()):
                return h.data, h.header
        raise KeyError("Extension %r not found in %s" % (ext, path))
    for h in hdus:
        if h.data is not None and not h.is_table:
            return h.data, h.header
    raise IOError("No image data found in %s" % path)


def read_table(path, ext=None):
    """Read the first binary-table HDU (or named extension).

    Returns (columns dict, header).
    """
    hdus = read(path)
    for i, h in enumerate(hdus):
        if not h.is_table:
            continue
        if ext is None:
            return h.data, h.header
        if (isinstance(ext, int) and i == ext) or \
           (isinstance(ext, str) and h.name.upper() == str(ext).upper()):
            return h.data, h.header
    raise IOError("No matching table HDU in %s" % path)


def _format_card(key, value):
    key = key.upper()[:8]
    if isinstance(value, bool):
        vstr = "%20s" % ("T" if value else "F")
    elif isinstance(value, (int, np.integer)):
        vstr = "%20d" % value
    elif isinstance(value, (float, np.floating)):
        vstr = "%20s" % repr(float(value))
        if len(vstr) > 20:
            vstr = "%20.13E" % value
    elif value is None:
        vstr = " " * 20
    else:
        s = str(value).replace("'", "''")
        vstr = "'%s'" % s.ljust(8)
    card = "%-8s= %s" % (key, vstr)
    return card[:80].ljust(80)


def _header_bytes(header):
    cards = []
    for key, value in header.items():
        if key in ("SIMPLE", "BITPIX", "XTENSION", "PCOUNT", "GCOUNT",
                   "TFIELDS", "EXTEND") or key.startswith("NAXIS"):
            continue  # structural keys are emitted explicitly by callers
        cards.append(_format_card(key, value))
    return cards


def _finish_header(cards):
    cards.append("END".ljust(80))
    blob = "".join(cards).encode("ascii")
    return blob + b" " * (_padded(len(blob)) - len(blob))


def _image_hdu_bytes(data, header, primary, name=""):
    cards = []
    if data is None:
        shape = ()
        bitpix = 8
    else:
        data = np.asarray(data)
        if data.dtype == np.bool_:
            data = data.astype(np.uint8)
        bitpix = _DTYPE_TO_BITPIX[data.dtype.name]
        shape = data.shape
    if primary:
        cards.append(_format_card("SIMPLE", True))
    else:
        cards.append(_format_card("XTENSION", "IMAGE"))
    cards.append(_format_card("BITPIX", bitpix))
    cards.append(_format_card("NAXIS", len(shape)))
    for i, n in enumerate(shape[::-1]):
        cards.append(_format_card("NAXIS%d" % (i + 1), int(n)))
    if primary:
        cards.append(_format_card("EXTEND", True))
    else:
        cards.append(_format_card("PCOUNT", 0))
        cards.append(_format_card("GCOUNT", 1))
    if name:
        cards.append(_format_card("EXTNAME", name))
    if header is not None:
        skip = {"SIMPLE", "BITPIX", "EXTEND", "XTENSION", "PCOUNT", "GCOUNT",
                "EXTNAME"}
        for key, value in header.items():
            if key in skip or key.startswith("NAXIS"):
                continue
            cards.append(_format_card(key, value))
    blob = _finish_header(cards)
    if data is not None:
        target = _BITPIX_TO_DTYPE[bitpix]
        raw = np.ascontiguousarray(data, dtype=target).tobytes()
        blob += raw + b"\x00" * (_padded(len(raw)) - len(raw))
    return blob


def _column_tform(arr):
    arr = np.asarray(arr)
    kind = arr.dtype.kind
    if kind in ("U", "S", "O"):
        strs = np.array([str(v) for v in arr])
        width = max(1, max((len(s) for s in strs), default=1))
        return "%dA" % width, strs, width
    if kind == "b":
        return "L", arr, 1
    if kind in ("i", "u"):
        if arr.dtype.itemsize <= 2:
            return "I", arr.astype(np.int16), 2
        if arr.dtype.itemsize <= 4:
            return "J", arr.astype(np.int32), 4
        return "K", arr.astype(np.int64), 8
    if arr.dtype == np.float32:
        return "E", arr, 4
    return "D", arr.astype(np.float64), 8


def _table_hdu_bytes(columns, header, name=""):
    colinfo = []
    nrows = None
    for cname, arr in columns.items():
        tform, conv, width = _column_tform(arr)
        if nrows is None:
            nrows = len(conv)
        if len(conv) != nrows:
            raise ValueError("Column %s length mismatch" % cname)
        colinfo.append((cname, tform, conv, width))
    nrows = nrows or 0
    rowbytes = sum(w for _, _, _, w in colinfo)

    cards = [
        _format_card("XTENSION", "BINTABLE"),
        _format_card("BITPIX", 8),
        _format_card("NAXIS", 2),
        _format_card("NAXIS1", rowbytes),
        _format_card("NAXIS2", nrows),
        _format_card("PCOUNT", 0),
        _format_card("GCOUNT", 1),
        _format_card("TFIELDS", len(colinfo)),
    ]
    for i, (cname, tform, _, _) in enumerate(colinfo):
        cards.append(_format_card("TTYPE%d" % (i + 1), cname))
        cards.append(_format_card("TFORM%d" % (i + 1), tform))
    if name:
        cards.append(_format_card("EXTNAME", name))
    if header is not None:
        skip = {"XTENSION", "BITPIX", "PCOUNT", "GCOUNT", "TFIELDS", "EXTNAME"}
        for key, value in header.items():
            if key in skip or key.startswith(("NAXIS", "TTYPE", "TFORM")):
                continue
            cards.append(_format_card(key, value))
    blob = _finish_header(cards)

    rows = np.zeros((nrows, rowbytes), dtype=np.uint8)
    offset = 0
    for cname, tform, conv, width in colinfo:
        if tform.endswith("A"):
            for r in range(nrows):
                enc = str(conv[r]).encode("ascii", errors="replace")[:width]
                rows[r, offset:offset + len(enc)] = np.frombuffer(enc, np.uint8)
                if len(enc) < width:
                    rows[r, offset + len(enc):offset + width] = ord(" ")
        elif tform == "L":
            rows[:, offset] = np.where(conv, ord("T"), ord("F"))
        else:
            be = np.ascontiguousarray(conv).astype(conv.dtype.newbyteorder(">"))
            rows[:, offset:offset + width] = be.view(np.uint8).reshape(nrows, width)
        offset += width
    raw = rows.tobytes()
    blob += raw + b"\x00" * (_padded(len(raw)) - len(raw))
    return blob


def write(path, hdus, overwrite=True):
    """Write a list of HDUs (or (data, header) pairs) to a FITS file."""
    if os.path.exists(path) and not overwrite:
        raise IOError("%s exists" % path)
    norm = []
    for h in hdus:
        if isinstance(h, HDU):
            norm.append(h)
        else:
            data, header = h
            norm.append(HDU(data=data, header=header))
    blob = b""
    for i, h in enumerate(norm):
        if h.is_table or isinstance(h.data, dict):
            if i == 0:
                # tables cannot be primary: emit empty primary first
                blob += _image_hdu_bytes(None, None, primary=True)
            blob += _table_hdu_bytes(h.data, h.header, name=h.name)
        else:
            blob += _image_hdu_bytes(h.data, h.header, primary=(i == 0),
                                     name=h.name if i > 0 else "")
    with _open_maybe_gzip(path, "wb") as f:
        f.write(blob)


def write_image(path, data, header=None, compressionType=None, overwrite=True):
    """Write a single image. ``compressionType`` mimics the reference's
    ``saveFITS`` interface (``maps.py:2371``): 'PLIO_1' downcasts to uint8,
    anything else non-None downcasts to float32 (no tile compression)."""
    if compressionType is not None and data is not None:
        if compressionType == "PLIO_1":
            data = np.asarray(data).astype(np.uint8)
        else:
            data = np.asarray(data).astype(np.float32)
    write(path, [HDU(data=data, header=header)], overwrite=overwrite)


def write_mef(path, named_arrays, headers=None, compressionType=None,
              overwrite=True):
    """Write a multi-extension FITS file from {extName: array}."""
    hdus = [HDU(data=None, header=None)]
    for name, arr in named_arrays.items():
        if compressionType == "PLIO_1":
            arr = np.asarray(arr).astype(np.uint8)
        elif compressionType is not None:
            arr = np.asarray(arr).astype(np.float32)
        hdr = None
        if headers is not None and name in headers:
            hdr = headers[name]
        hdus.append(HDU(data=arr, header=hdr, name=name))
    write(path, hdus, overwrite=overwrite)
