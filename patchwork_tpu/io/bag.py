"""Offline ROS2 bag ingest: DB3 (sqlite3) and MCAP -> numpy arrays.

Replaces the reference RosbagLoader (src/rosbag_loader.cpp) with a
middleware-free decode path:

* format sniffing by magic bytes (MCAP "\\x89MCAP", SQLite 16-byte header)
  — same detection the reference uses (rosbag_loader.cpp:171-194);
* DB3: read the standard rosbag2 schema (topics/messages tables) with
  stdlib sqlite3 — the reference's loadDB3PointCloud is a TODO stub
  returning false (rosbag_loader.cpp:296-304);
* PointCloud2 decode: a REAL CDR deserializer (alignment-correct) instead
  of the reference's raw struct cast of the serialized buffer
  (convertPointCloud2ToPoints, rosbag_loader.cpp:226-254, a known-unsound
  shortcut); field offsets honored, arbitrary point_step, optional
  intensity;
* topic heuristics: point-cloud topics found by name substring
  ("point"/"cloud"/"lidar"), mirroring rosbag_loader.cpp:77-90.

The hot byte->array conversion is NumPy strided slicing (vectorized); the
optional native C extension (patchwork_tpu.io.native) accelerates bulk
multi-message decode.
"""

from __future__ import annotations

import os
import sqlite3
import struct
from typing import Dict, Iterator, List, Tuple

import numpy as np

__all__ = [
    "is_mcap_format",
    "is_db3_format",
    "sniff_format",
    "decode_pointcloud2_cdr",
    "encode_pointcloud2_cdr",
    "BagReader",
]

_MCAP_MAGIC = b"\x89MCAP"
_SQLITE_MAGIC = b"SQLite format 3\x00"

# PointField datatypes (sensor_msgs/PointField)
_PF_DTYPES = {
    1: np.int8, 2: np.uint8, 3: np.int16, 4: np.uint16,
    5: np.int32, 6: np.uint32, 7: np.float32, 8: np.float64,
}


def is_mcap_format(path: str) -> bool:
    """Magic-byte sniff (reference isMCAPFormat, rosbag_loader.cpp:171-182)."""
    with open(path, "rb") as f:
        return f.read(5) == _MCAP_MAGIC


def is_db3_format(path: str) -> bool:
    """SQLite header sniff (reference isDB3Format, rosbag_loader.cpp:184-194)."""
    with open(path, "rb") as f:
        return f.read(16) == _SQLITE_MAGIC


def sniff_format(path: str) -> str:
    if is_mcap_format(path):
        return "mcap"
    if is_db3_format(path):
        return "db3"
    raise ValueError(f"{path}: neither MCAP nor SQLite/DB3 (unknown bag format)")


# ---------------------------------------------------------------------------
# CDR deserialization of sensor_msgs/msg/PointCloud2
# ---------------------------------------------------------------------------

class _CdrReader:
    """Minimal XCDR1 reader (little-endian), alignment relative to the
    payload start (after the 4-byte encapsulation header)."""

    def __init__(self, buf: bytes):
        if len(buf) < 4:
            raise ValueError("CDR buffer too short")
        # encapsulation: {0x00, 0x01} = CDR_LE; {0x00, 0x00} = CDR_BE
        if buf[1] not in (0, 1):
            raise ValueError(f"unknown CDR encapsulation {buf[:2]!r}")
        self.little = buf[1] == 1
        self.buf = memoryview(buf)[4:]
        self.pos = 0

    def _align(self, size: int) -> None:
        rem = self.pos % size
        if rem:
            self.pos += size - rem

    def _unpack(self, fmt: str, size: int):
        self._align(size)
        end = "<" if self.little else ">"
        (v,) = struct.unpack_from(end + fmt, self.buf, self.pos)
        self.pos += size
        return v

    def u8(self) -> int:
        return self._unpack("B", 1)

    def u16(self) -> int:
        return self._unpack("H", 2)

    def i32(self) -> int:
        return self._unpack("i", 4)

    def u32(self) -> int:
        return self._unpack("I", 4)

    def string(self) -> str:
        n = self.u32()  # length including NUL
        s = bytes(self.buf[self.pos : self.pos + max(n - 1, 0)])
        self.pos += n
        return s.decode("utf-8", errors="replace")

    def bytes_seq(self) -> memoryview:
        n = self.u32()
        out = self.buf[self.pos : self.pos + n]
        self.pos += n
        return out


def decode_pointcloud2_cdr(
    buf: bytes, want_fields: Tuple[str, ...] = ("x", "y", "z")
) -> np.ndarray:
    """Decode a CDR-serialized PointCloud2 into an (n, len(want_fields))
    float32 array.  Missing fields raise KeyError."""
    r = _CdrReader(buf)
    # std_msgs/Header: time (i32 sec, u32 nanosec), string frame_id
    r.i32()
    r.u32()
    r.string()
    height = r.u32()
    width = r.u32()
    nfields = r.u32()
    fields: Dict[str, Tuple[int, int, int]] = {}
    for _ in range(nfields):
        name = r.string()
        offset = r.u32()
        datatype = r.u8()
        count = r.u32()
        fields[name] = (offset, datatype, count)
    r.u8()  # is_bigendian
    point_step = r.u32()
    r.u32()  # row_step
    data = np.frombuffer(r.bytes_seq(), dtype=np.uint8)
    n = height * width
    if point_step == 0 or n == 0:
        return np.zeros((0, len(want_fields)), np.float32)
    n = min(n, len(data) // point_step)
    data = data[: n * point_step].reshape(n, point_step)

    cols = []
    for name in want_fields:
        if name not in fields:
            raise KeyError(f"PointCloud2 missing field {name!r}")
        off, dtype_id, _ = fields[name]
        dt = _PF_DTYPES[dtype_id]
        width_b = np.dtype(dt).itemsize
        col = data[:, off : off + width_b].copy().view(dt)[:, 0]
        cols.append(col.astype(np.float32))
    return np.stack(cols, axis=1)


def encode_pointcloud2_cdr(
    pts: np.ndarray, frame_id: str = "lidar", with_intensity: bool = False
) -> bytes:
    """Encode an (n, 3|4) float32 array as a CDR PointCloud2 (the inverse
    of :func:`decode_pointcloud2_cdr`; used for tests and bag writing)."""
    pts = np.asarray(pts, np.float32)
    nf = 4 if with_intensity else 3
    names = ["x", "y", "z", "intensity"][:nf]
    point_step = 4 * nf
    n = len(pts)

    out = bytearray(b"\x00\x01\x00\x00")  # CDR_LE encapsulation
    pos = [0]

    def align(sz):
        rem = pos[0] % sz
        if rem:
            pad = sz - rem
            out.extend(b"\x00" * pad)
            pos[0] += pad

    def put(fmt, v, sz):
        align(sz)
        out.extend(struct.pack("<" + fmt, v))
        pos[0] += sz

    def put_str(s):
        b = s.encode() + b"\x00"
        put("I", len(b), 4)
        out.extend(b)
        pos[0] += len(b)

    put("i", 0, 4)          # header.stamp.sec
    put("I", 0, 4)          # header.stamp.nanosec
    put_str(frame_id)
    put("I", 1, 4)          # height
    put("I", n, 4)          # width
    put("I", nf, 4)         # fields length
    for i, name in enumerate(names):
        put_str(name)
        put("I", 4 * i, 4)  # offset
        put("B", 7, 1)      # FLOAT32
        put("I", 1, 4)      # count
    put("B", 0, 1)          # is_bigendian
    put("I", point_step, 4)
    put("I", point_step * n, 4)  # row_step
    blob = pts[:, :nf].astype("<f4").tobytes()
    put("I", len(blob), 4)
    out.extend(blob)
    pos[0] += len(blob)
    put("B", 1, 1)          # is_dense
    return bytes(out)


# ---------------------------------------------------------------------------
# DB3 (rosbag2 sqlite3)
# ---------------------------------------------------------------------------

class _Db3Backend:
    def __init__(self, path: str):
        self.conn = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
        cur = self.conn.execute("SELECT id, name, type FROM topics")
        self.topics = {name: (tid, typ) for tid, name, typ in cur.fetchall()}

    def topic_names(self) -> List[str]:
        return list(self.topics)

    def message_count(self, topic: str) -> int:
        tid = self.topics[topic][0]
        (n,) = self.conn.execute(
            "SELECT COUNT(*) FROM messages WHERE topic_id=?", (tid,)
        ).fetchone()
        return n

    def messages(self, topic: str) -> Iterator[Tuple[int, bytes]]:
        tid = self.topics[topic][0]
        cur = self.conn.execute(
            "SELECT timestamp, data FROM messages WHERE topic_id=? "
            "ORDER BY timestamp",
            (tid,),
        )
        yield from cur

    def close(self):
        self.conn.close()


# ---------------------------------------------------------------------------
# MCAP (minimal reader: Schema/Channel/Message (+ Chunk) records)
# ---------------------------------------------------------------------------

_OP_SCHEMA, _OP_CHANNEL, _OP_MESSAGE, _OP_CHUNK = 0x03, 0x04, 0x05, 0x06


def _mcap_records(buf: memoryview) -> Iterator[Tuple[int, memoryview]]:
    pos = 0
    end = len(buf)
    while pos + 9 <= end:
        op = buf[pos]
        (length,) = struct.unpack_from("<Q", buf, pos + 1)
        pos += 9
        yield op, buf[pos : pos + length]
        pos += length


def _decompress(algo: str, payload: bytes, raw_size: int) -> bytes:
    if algo == "":
        return payload
    if algo == "zstd":
        try:
            import zstandard

            return zstandard.ZstdDecompressor().decompress(
                payload, max_output_size=raw_size
            )
        except ImportError as e:
            raise RuntimeError("zstd-compressed MCAP needs zstandard") from e
    if algo == "lz4":
        try:
            import lz4.frame

            return lz4.frame.decompress(payload)
        except ImportError as e:
            raise RuntimeError("lz4-compressed MCAP needs lz4") from e
    raise RuntimeError(f"unsupported MCAP compression {algo!r}")


class _McapBackend:
    def __init__(self, path: str):
        with open(path, "rb") as f:
            raw = f.read()
        if raw[:5] != _MCAP_MAGIC:
            raise ValueError(f"{path}: not an MCAP file")
        self._channels: Dict[int, str] = {}       # channel_id -> topic
        self._msgs: Dict[str, List[Tuple[int, bytes]]] = {}
        body = memoryview(raw)[8:]
        self._scan(body)

    def _scan(self, buf: memoryview) -> None:
        for op, payload in _mcap_records(buf):
            if op == _OP_CHANNEL:
                (cid,) = struct.unpack_from("<H", payload, 0)
                pos = 2 + 2  # channel_id + schema_id
                (tlen,) = struct.unpack_from("<I", payload, pos)
                topic = bytes(payload[pos + 4 : pos + 4 + tlen]).decode()
                self._channels[cid] = topic
                self._msgs.setdefault(topic, [])
            elif op == _OP_MESSAGE:
                self._add_message(payload)
            elif op == _OP_CHUNK:
                pos = 0
                _start, _end, raw_size = struct.unpack_from("<QQQ", payload, pos)
                pos += 24
                (clen,) = struct.unpack_from("<I", payload, pos)
                algo = bytes(payload[pos + 4 : pos + 4 + clen]).decode()
                pos += 4 + clen
                (rlen,) = struct.unpack_from("<Q", payload, pos)
                pos += 8
                inner = _decompress(
                    algo, bytes(payload[pos : pos + rlen]), raw_size
                )
                self._scan(memoryview(inner))

    def _add_message(self, payload: memoryview) -> None:
        cid, _seq, log_time, _pub = struct.unpack_from("<HIQQ", payload, 0)
        topic = self._channels.get(cid)
        if topic is not None:
            self._msgs[topic].append((log_time, bytes(payload[22:])))

    def topic_names(self) -> List[str]:
        return list(self._msgs)

    def message_count(self, topic: str) -> int:
        return len(self._msgs.get(topic, []))

    def messages(self, topic: str) -> Iterator[Tuple[int, bytes]]:
        yield from sorted(self._msgs.get(topic, []), key=lambda t: t[0])

    def close(self):
        self._msgs.clear()


# ---------------------------------------------------------------------------
# public reader (reference RosbagLoader surface, rosbag_loader.hpp:25-46)
# ---------------------------------------------------------------------------

class BagReader:
    """Array-native bag reader: DB3 or MCAP behind one interface."""

    def __init__(self, path: str):
        if not os.path.exists(path):
            raise FileNotFoundError(path)
        self.path = path
        self.format = sniff_format(path)
        self._b = _Db3Backend(path) if self.format == "db3" else _McapBackend(path)

    # reference getTopicNames / getPointCloudTopics (cpp:55-90)
    def topic_names(self) -> List[str]:
        return self._b.topic_names()

    def point_cloud_topics(self) -> List[str]:
        keys = ("point", "cloud", "lidar")
        return [
            t for t in self.topic_names() if any(k in t.lower() for k in keys)
        ]

    def message_count(self, topic: str) -> int:
        return self._b.message_count(topic)

    # reference loadPointCloud (cpp:112-155) — frame-indexed single load
    def load_point_cloud(
        self, topic: str, frame: int = 0,
        fields: Tuple[str, ...] = ("x", "y", "z"),
    ) -> np.ndarray:
        for i, (_ts, blob) in enumerate(self._b.messages(topic)):
            if i == frame:
                return decode_pointcloud2_cdr(blob, fields)
        return np.zeros((0, len(fields)), np.float32)

    # reference loadMultiplePointClouds (cpp:157-169)
    def load_multiple_point_clouds(
        self, topics: List[str], frame: int = 0
    ) -> List[np.ndarray]:
        return [self.load_point_cloud(t, frame) for t in topics]

    def iter_point_clouds(
        self, topic: str, fields: Tuple[str, ...] = ("x", "y", "z")
    ) -> Iterator[np.ndarray]:
        for _ts, blob in self._b.messages(topic):
            yield decode_pointcloud2_cdr(blob, fields)

    def close(self) -> None:
        self._b.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
