"""ROS bag (format 2.0) ingestion tests.

The reference is operated via ``rosbag play data.bag`` (README.md:88-96);
fiesta_tpu reads the bags directly.  Coverage:

  * reader vs a hand-packed golden bag (byte layout written independently
    of the module's writer, so a mirrored writer/reader bug cannot hide);
  * write/read round trips for all five supported message types, both
    chunk compressions, topic filtering, receive-order reordering;
  * the ``run.py --bag`` end-to-end path (cloud bag and depth-image bag,
    including the recorded-resolution intrinsics rescale).
"""

import struct

import numpy as np
import pytest

from fiesta_tpu.io import replay, rosbag


# ---------------------------------------------------------------------------
# golden-bytes reader test (constructed without the module's writer)
# ---------------------------------------------------------------------------


def _field(name: bytes, value: bytes) -> bytes:
    item = name + b"=" + value
    return struct.pack("<I", len(item)) + item


def _record(fields: bytes, data: bytes) -> bytes:
    return (struct.pack("<I", len(fields)) + fields
            + struct.pack("<I", len(data)) + data)


def _golden_bag() -> bytes:
    """A minimal spec-conformant bag: file header, one uncompressed chunk
    holding one connection + one TransformStamped message."""
    # serialized geometry_msgs/TransformStamped: header(seq,stamp,frame),
    # child_frame_id, translation f64x3, rotation(x,y,z,w) f64x4
    msg = (struct.pack("<III", 7, 100, 500_000_000)
           + struct.pack("<I", 5) + b"world"
           + struct.pack("<I", 4) + b"body"
           + np.asarray([1.0, 2.0, 3.0], "<f8").tobytes()
           + np.asarray([0.0, 0.0, 0.0, 1.0], "<f8").tobytes())
    conn_hdr = (_field(b"topic", b"/tf_topic")
                + _field(b"type", b"geometry_msgs/TransformStamped")
                + _field(b"md5sum", b"*")
                + _field(b"message_definition", b""))
    inner = (_record(_field(b"op", b"\x07") + _field(b"conn", b"\x00" * 4)
                     + _field(b"topic", b"/tf_topic"), conn_hdr)
             + _record(_field(b"op", b"\x02") + _field(b"conn", b"\x00" * 4)
                       + _field(b"time", struct.pack("<II", 100, 500_000_000)),
                       msg))
    chunk = _record(_field(b"op", b"\x05") + _field(b"compression", b"none")
                    + _field(b"size", struct.pack("<I", len(inner))), inner)
    fh = (_field(b"op", b"\x03")
          + _field(b"index_pos", struct.pack("<Q", 0))
          + _field(b"conn_count", struct.pack("<I", 1))
          + _field(b"chunk_count", struct.pack("<I", 1)))
    pad = 4096 - 8 - len(fh)
    file_header = (struct.pack("<I", len(fh)) + fh
                   + struct.pack("<I", pad) + b" " * pad)
    return rosbag.MAGIC + file_header + chunk


def test_reader_parses_golden_bytes(tmp_path):
    path = str(tmp_path / "golden.bag")
    with open(path, "wb") as f:
        f.write(_golden_bag())
    msgs = list(rosbag.read_messages(path))
    assert len(msgs) == 1
    m = msgs[0]
    assert m.topic == "/tf_topic"
    assert m.datatype == "geometry_msgs/TransformStamped"
    assert m.t == pytest.approx(100.5)
    assert m.msg.header.frame_id == "world"
    assert m.msg.child_frame_id == "body"
    np.testing.assert_allclose(m.msg.pos, [1.0, 2.0, 3.0])
    np.testing.assert_allclose(m.msg.quat_wxyz, [1.0, 0.0, 0.0, 0.0])
    # unindexed bag: connections resolved by the fallback scan
    assert rosbag.bag_connections(path) == {
        "/tf_topic": "geometry_msgs/TransformStamped"}


def test_reader_rejects_bad_magic(tmp_path):
    path = str(tmp_path / "bad.bag")
    with open(path, "wb") as f:
        f.write(b"#ROSBAG V1.2\x0a" + b"\x00" * 64)
    with pytest.raises(ValueError, match="not a ROS bag v2.0"):
        list(rosbag.read_messages(path))


# ---------------------------------------------------------------------------
# write/read round trips
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("compression", ["none", "bz2", "lz4"])
def test_roundtrip_all_types(tmp_path, compression):
    rng = np.random.default_rng(0)
    cloud = rng.normal(size=(50, 3)).astype(np.float32)
    cloud[3] = np.nan                      # NaN points must survive
    depth = rng.uniform(0.5, 4.0, size=(6, 8)).astype(np.float32)

    msgs = [
        (1.0, "/tf", rosbag.make_transform(
            1.0, [1, 2, 3], [0.5, 0.5, 0.5, 0.5])),
        (1.1, "/pose", rosbag.PoseStamped(
            rosbag.Header(0, 1.1, "world"),
            np.asarray([4.0, 5.0, 6.0]),
            np.asarray([0.0, 0.0, 0.0, 1.0]))),
        (1.2, "/odom", rosbag.Odometry(
            rosbag.Header(0, 1.2, "world"), "base",
            np.asarray([7.0, 8.0, 9.0]),
            np.asarray([0.0, 1.0, 0.0, 0.0]),
            np.asarray([0.1, 0.2, 0.3]), np.zeros(3))),
        (1.3, "/cloud", rosbag.make_pointcloud2(1.3, cloud)),
        (1.4, "/depth16", rosbag.make_depth_image(
            1.4, depth, encoding="16UC1")),
        (1.5, "/depth32", rosbag.make_depth_image(
            1.5, depth, encoding="32FC1")),
    ]
    path = str(tmp_path / f"rt_{compression}.bag")
    rosbag.write_bag(path, msgs, compression=compression)

    out = list(rosbag.read_messages(path))
    assert [m.topic for m in out] == [t for _, t, _ in msgs]
    assert out[0].msg.quat_wxyz[0] == pytest.approx(0.5)
    np.testing.assert_allclose(out[0].msg.pos, [1, 2, 3])
    np.testing.assert_allclose(out[1].msg.pos, [4, 5, 6])
    np.testing.assert_allclose(out[2].msg.pos, [7, 8, 9])
    np.testing.assert_allclose(out[2].msg.quat_wxyz, [0, 0, 1, 0])

    got = out[3].msg.xyz()
    assert got.shape == (50, 3)
    np.testing.assert_array_equal(np.isnan(got), np.isnan(cloud))
    np.testing.assert_allclose(np.nan_to_num(got), np.nan_to_num(cloud))

    # 16UC1 quantizes to millimeters; 32FC1 is exact
    np.testing.assert_allclose(out[4].msg.depth_m(1000.0), depth, atol=5e-4)
    np.testing.assert_allclose(out[5].msg.depth_m(1000.0), depth)

    # the index section makes connection lookup O(1)
    conns = rosbag.bag_connections(path)
    assert conns["/cloud"] == "sensor_msgs/PointCloud2"
    assert conns["/depth16"] == "sensor_msgs/Image"

    info = rosbag.bag_info(path)
    assert info["/tf"]["count"] == 1
    assert info["/cloud"]["type"] == "sensor_msgs/PointCloud2"


def test_strided_pointcloud_and_bigendian_fields(tmp_path):
    """xyz extraction must honor point_step/field offsets (real kinect
    clouds carry rgb padding -> 32-byte point_step)."""
    n = 17
    rng = np.random.default_rng(1)
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    raw = np.zeros((n, 32), np.uint8)
    raw[:, 4:16] = xyz.astype("<f4").view(np.uint8).reshape(n, 12)
    pc = rosbag.PointCloud2(
        rosbag.Header(0, 2.0, "cam"), 1, n,
        [rosbag.PointField("x", 4, 7, 1), rosbag.PointField("y", 8, 7, 1),
         rosbag.PointField("z", 12, 7, 1),
         rosbag.PointField("rgb", 16, 7, 1)],
        False, 32, 32 * n, raw.tobytes(), True)
    np.testing.assert_allclose(pc.xyz(), xyz)


def test_reorder_and_topic_filter(tmp_path):
    """Messages written in receive order but with out-of-order header
    stamps come back time-ordered (the reorder buffer), and topic
    filtering drops everything else."""
    msgs = [
        (10.0, "/tf", rosbag.make_transform(10.02, [0, 0, 0], [1, 0, 0, 0])),
        (10.0, "/junk", rosbag.make_transform(10.0, [9, 9, 9], [1, 0, 0, 0])),
        (10.1, "/tf", rosbag.make_transform(10.01, [1, 0, 0], [1, 0, 0, 0])),
        (10.2, "/tf", rosbag.make_transform(10.03, [2, 0, 0], [1, 0, 0, 0])),
    ]
    path = str(tmp_path / "ooo.bag")
    rosbag.write_bag(path, msgs)
    out = list(rosbag.read_messages(path, topics=["/tf"]))
    assert [m.topic for m in out] == ["/tf"] * 3
    assert [m.t for m in out] == sorted(m.t for m in out)
    assert out[0].msg.pos[0] == 1.0     # stamp 10.01 first


def test_pick_topics():
    info = {
        "/camera/depth_registered/points": {
            "type": "sensor_msgs/PointCloud2", "count": 100},
        "/other_cloud": {"type": "sensor_msgs/PointCloud2", "count": 5},
        "/kinect/vrpn_client/estimated_transform": {
            "type": "geometry_msgs/TransformStamped", "count": 900},
        "/strings": {"type": "std_msgs/String", "count": 10_000},
    }
    s, p = rosbag.pick_topics(info)
    assert s == "/camera/depth_registered/points"
    assert p == "/kinect/vrpn_client/estimated_transform"
    # explicit names win when present
    s, p = rosbag.pick_topics(info, sensor_topic="/other_cloud")
    assert s == "/other_cloud"
    # plain topic->type maps (bag_connections output) work too
    s2, p2 = rosbag.pick_topics(
        {t: e["type"] for t, e in info.items()})
    assert s2 in ("/camera/depth_registered/points", "/other_cloud")
    assert p2 == "/kinect/vrpn_client/estimated_transform"
    with pytest.raises(ValueError, match="no sensor topic"):
        rosbag.pick_topics({"/a": "std_msgs/String"})


def test_corrupt_lz4_chunk_is_a_clear_error(tmp_path):
    """An lz4-tagged chunk whose payload is not a valid LZ4 frame fails
    loudly (bad magic), not with garbage messages."""
    path = str(tmp_path / "lz4.bag")
    inner = b"\x00\x01\x02\x03not a frame"
    chunk = _record(_field(b"op", b"\x05") + _field(b"compression", b"lz4")
                    + _field(b"size", struct.pack("<I", 0)), inner)
    with open(path, "wb") as f:
        f.write(rosbag.MAGIC + chunk)
    with pytest.raises(ValueError, match="magic"):
        list(rosbag.read_messages(path))


# ---------------------------------------------------------------------------
# end-to-end: run.py --bag
# ---------------------------------------------------------------------------


def _small_cfg_frames(kind: str, h: int, w: int, n_frames: int = 9):
    from fiesta_tpu.run import _preset_cfg

    cfg, ph, pw = _preset_cfg("small")
    if (h, w) != (ph, pw):
        import dataclasses

        cfg = dataclasses.replace(
            replay.scale_intrinsics(cfg, h, w, base_height=ph, base_width=pw),
            max_points_per_scan=h * w)
    _, frames = replay.make_sequence(
        cfg, n_frames=n_frames, n_boxes=4, seed=5, height=h, width=w,
        kind=kind)
    return frames


def test_run_bag_cloud_end_to_end(tmp_path):
    from fiesta_tpu import checkpoint
    from fiesta_tpu.run import main

    frames = _small_cfg_frames("cloud", 120, 160)
    bag = str(tmp_path / "seq.bag")
    rosbag.frames_to_bag(bag, frames, kind="cloud",
                         sensor_topic="/cam/points", pose_topic="/vrpn")
    ck = str(tmp_path / "map.npz")
    rc = main(["--bag", bag, "--preset", "small", "--platform", "cpu",
               "--checkpoint", ck])
    assert rc == 0
    _cfg, state = checkpoint.load(ck)
    from fiesta_tpu.grid import occupied_grid

    assert int(np.asarray(occupied_grid(_cfg, state.logodds)).sum()) > 0


def test_run_bag_depth_with_resolution_rescale(tmp_path):
    """Depth-image bag whose resolution differs from the preset's: the
    runner must rescale intrinsics to the recorded image grid."""
    from fiesta_tpu import checkpoint
    from fiesta_tpu.run import main

    frames = _small_cfg_frames("depth", 60, 80)
    bag = str(tmp_path / "depth.bag")
    rosbag.frames_to_bag(bag, frames, kind="depth",
                         sensor_topic="/cam/depth", pose_topic="/pose")
    ck = str(tmp_path / "map16.npz")
    rc = main(["--bag", bag, "--preset", "small", "--platform", "cpu",
               "--checkpoint", ck])
    assert rc == 0
    _cfg, state = checkpoint.load(ck)
    from fiesta_tpu.grid import occupied_grid

    assert int(np.asarray(occupied_grid(_cfg, state.logodds)).sum()) > 0


def test_bag_replay_equals_npz_replay(tmp_path):
    """The SAME frame sequence fed through the bag reader and through the
    npz loader must produce bit-identical maps (update-every-1 cadence so
    tick grouping is unambiguous): catches quaternion-order, timestamp,
    and point-decoding mistakes in one shot."""
    from fiesta_tpu import checkpoint
    from fiesta_tpu.run import main

    frames = _small_cfg_frames("cloud", 120, 160, n_frames=7)

    npz = str(tmp_path / "seq.npz")
    np.savez_compressed(
        npz,
        t=np.asarray([t for t, _, _ in frames]),
        pos=np.stack([p for _, (p, _), _ in frames]),
        quat=np.stack([q for _, (_, q), _ in frames]),
        clouds=np.stack([s for _, _, s in frames]),
    )
    bag = str(tmp_path / "seq.bag")
    rosbag.frames_to_bag(bag, frames, kind="cloud")

    ck_a, ck_b = str(tmp_path / "a.npz"), str(tmp_path / "b.npz")
    assert main(["--replay", npz, "--preset", "small", "--platform", "cpu",
                 "--update-every", "1", "--checkpoint", ck_a]) == 0
    assert main(["--bag", bag, "--preset", "small", "--platform", "cpu",
                 "--update-every", "1", "--checkpoint", ck_b]) == 0

    _, sa = checkpoint.load(ck_a)
    _, sb = checkpoint.load(ck_b)
    np.testing.assert_array_equal(np.asarray(sa.logodds),
                                  np.asarray(sb.logodds))
    np.testing.assert_array_equal(np.asarray(sa.d2), np.asarray(sb.d2))


def test_truncated_and_corrupt_bags_fail_cleanly(tmp_path):
    """Truncated/corrupt bags must raise (or stop) promptly — never hang
    or produce garbage messages."""
    frames = _small_cfg_frames("cloud", 60, 80, n_frames=3)
    bag = str(tmp_path / "full.bag")
    rosbag.frames_to_bag(bag, frames)
    blob = open(bag, "rb").read()

    for cut in (len(blob) // 3, len(blob) // 2, len(blob) - 7):
        path = str(tmp_path / f"cut_{cut}.bag")
        with open(path, "wb") as f:
            f.write(blob[:cut])
        try:
            msgs = list(rosbag.read_messages(path))
        except Exception:
            continue                      # clean failure is acceptable
        # partial success: every yielded message must be well-formed
        for m in msgs:
            assert m.datatype in rosbag._DESERIALIZERS
            assert np.isfinite(m.t)


def test_cli_converter_roundtrip(tmp_path, capsys):
    """bag -> npz -> bag via the module CLI preserves the sequence."""
    from fiesta_tpu.io.rosbag import _cli

    frames = _small_cfg_frames("cloud", 60, 80, n_frames=4)
    bag1 = str(tmp_path / "a.bag")
    rosbag.frames_to_bag(bag1, frames)

    npz = str(tmp_path / "a.npz")
    assert _cli(["to-npz", bag1, npz]) == 0
    data = np.load(npz)
    assert len(data["t"]) == 4
    assert data["clouds"].shape[0] == 4
    np.testing.assert_allclose(data["pos"][0], frames[0][1][0])

    bag2 = str(tmp_path / "b.bag")
    assert _cli(["from-npz", npz, bag2, "--compression", "bz2"]) == 0
    out = [m for m in rosbag.read_messages(bag2)
           if m.datatype == "sensor_msgs/PointCloud2"]
    assert len(out) == 4
    got = out[0].msg.xyz()
    want = np.asarray(frames[0][2], np.float32)
    np.testing.assert_array_equal(np.isnan(got), np.isnan(want))
    np.testing.assert_allclose(np.nan_to_num(got), np.nan_to_num(want))

    assert _cli(["info", bag2]) == 0
    assert "PointCloud2" in capsys.readouterr().out


def test_row_padded_organized_cloud_decodes_correctly():
    """Organized clouds with row padding (row_step > width*point_step):
    rows must decode at their strides, never contiguously across the
    padding (Kinect/OpenNI recordings pad rows)."""
    h, w = 4, 5
    rng = np.random.default_rng(3)
    xyz = rng.normal(size=(h, w, 3)).astype(np.float32)
    point_step = 16
    pad = 8                                  # bytes of padding per row
    row_step = w * point_step + pad
    raw = np.zeros((h, row_step), np.uint8)
    for r in range(h):
        row = np.zeros((w, point_step), np.uint8)
        row[:, 0:12] = xyz[r].astype("<f4").view(np.uint8).reshape(w, 12)
        raw[r, : w * point_step] = row.reshape(-1)
    pc = rosbag.PointCloud2(
        rosbag.Header(0, 1.0, "cam"), h, w,
        [rosbag.PointField("x", 0, 7, 1), rosbag.PointField("y", 4, 7, 1),
         rosbag.PointField("z", 8, 7, 1)],
        False, point_step, row_step, raw.tobytes(), True)
    np.testing.assert_allclose(pc.xyz(), xyz.reshape(-1, 3))


def test_reorder_watermarks_handle_large_stamp_lag(tmp_path):
    """A topic whose header stamps lag receive time by more than the
    slack (sensor pipeline latency) must still come out time-ordered:
    release is gated on per-topic stamp watermarks, not receive time."""
    lag = 2.0     # stamp-to-receive-time skew >> default 0.5 s slack
    msgs = []
    t = 100.0
    for i in range(6):
        msgs.append((t, "/pose",
                     rosbag.make_transform(t, [i, 0, 0], [1, 0, 0, 0])))
        msgs.append((t + 0.05, "/depth",
                     rosbag.make_transform(t + 0.05 - lag, [0, i, 0],
                                           [1, 0, 0, 0])))
        t += 0.3
    path = str(tmp_path / "lag.bag")
    rosbag.write_bag(path, msgs)
    out = list(rosbag.read_messages(path))
    assert len(out) == 12
    ts = [m.t for m in out]
    assert ts == sorted(ts), f"non-monotone output: {ts}"


def test_pick_topics_rejects_missing_explicit_topic():
    info = {"/cloud": {"type": "sensor_msgs/PointCloud2", "count": 10},
            "/tf": {"type": "geometry_msgs/TransformStamped", "count": 10}}
    with pytest.raises(ValueError, match="not in the bag"):
        rosbag.pick_topics(info, sensor_topic="/typo/points")
    with pytest.raises(ValueError, match="not in the bag"):
        rosbag.pick_topics(info, pose_topic="/typo/pose")


def test_truncated_record_raises_clear_error(tmp_path):
    """A bag cut mid-record-header must name the truncation, not die with
    a cryptic struct.error (the trailing-index region tolerates cuts; a
    cut inside a record body cannot)."""
    import struct

    path = str(tmp_path / "cut.bag")
    with open(path, "wb") as f:
        f.write(rosbag.MAGIC)
        f.write(struct.pack("<I", 100))   # record header claims 100 bytes
        f.write(b"x" * 10)                # ...only 10 present
    with pytest.raises(ValueError, match="truncated"):
        list(rosbag.read_messages(path))
