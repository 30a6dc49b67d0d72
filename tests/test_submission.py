"""Submission writer tests: wire-format round trip + quantization parity."""

import os
import zlib

import numpy as np
import pytest

import jax.numpy as jnp

from strajnet_tpu.infer.proto import decode_varint, encode_varint, iter_fields
from strajnet_tpu.infer.submission import (
    ChallengeSubmission,
    ScenarioPrediction,
    Waypoint,
    quantize_waypoints,
    submission_shard_filename,
)
from strajnet_tpu.objective.loss import WaypointGrids


def test_varint_roundtrip():
    for v in (0, 1, 127, 128, 300, 2 ** 21, 2 ** 35, 2 ** 63 - 1):
        buf = encode_varint(v)
        out, pos = decode_varint(buf)
        assert out == v and pos == len(buf)


def test_submission_wire_roundtrip():
    sub = ChallengeSubmission(
        account_name="a@b.c", unique_method_name="strajnet_tpu",
        authors=["x", "y"], description="d", method_link="https://e",
        scenario_predictions=[ScenarioPrediction(
            scenario_id="abc123",
            waypoints=[Waypoint(b"obs", b"occ", b"flow")])])
    buf = sub.serialize()
    fields = list(iter_fields(buf))
    by_num = {}
    for num, _, val in fields:
        by_num.setdefault(num, []).append(val)
    assert by_num[1] == [b"a@b.c"]
    assert by_num[2] == [b"strajnet_tpu"]
    assert by_num[3] == [b"x", b"y"]
    # scenario predictions at field 7
    sp = list(iter_fields(by_num[7][0]))
    assert sp[0][2] == b"abc123"
    wp = list(iter_fields(sp[1][2]))
    assert [v for _, _, v in wp] == [b"obs", b"occ", b"flow"]


def test_submission_parses_with_protobuf_if_available():
    """Cross-check our wire bytes with the official protobuf runtime by
    compiling a matching descriptor on the fly (numbers must agree)."""
    pytest.importorskip("google.protobuf")
    from google.protobuf import descriptor_pb2, descriptor_pool
    from google.protobuf import message_factory

    pool = descriptor_pool.DescriptorPool()
    fdp = descriptor_pb2.FileDescriptorProto()
    fdp.name = "test_sub.proto"
    fdp.package = "t"

    wp = fdp.message_type.add()
    wp.name = "Waypoint"
    for i, n in enumerate(["observed_vehicles_occupancy",
                           "occluded_vehicles_occupancy",
                           "all_vehicles_flow"], 1):
        f = wp.field.add()
        f.name, f.number = n, i
        f.type = descriptor_pb2.FieldDescriptorProto.TYPE_BYTES
        f.label = descriptor_pb2.FieldDescriptorProto.LABEL_OPTIONAL

    sp = fdp.message_type.add()
    sp.name = "ScenarioPrediction"
    f = sp.field.add()
    f.name, f.number = "scenario_id", 1
    f.type = descriptor_pb2.FieldDescriptorProto.TYPE_STRING
    f.label = descriptor_pb2.FieldDescriptorProto.LABEL_OPTIONAL
    f = sp.field.add()
    f.name, f.number = "waypoints", 2
    f.type = descriptor_pb2.FieldDescriptorProto.TYPE_MESSAGE
    f.type_name = ".t.Waypoint"
    f.label = descriptor_pb2.FieldDescriptorProto.LABEL_REPEATED

    cs = fdp.message_type.add()
    cs.name = "ChallengeSubmission"
    scalars = [("account_name", 1), ("unique_method_name", 2),
               ("affiliation", 4), ("description", 5), ("method_link", 6)]
    for n, i in scalars:
        f = cs.field.add()
        f.name, f.number = n, i
        f.type = descriptor_pb2.FieldDescriptorProto.TYPE_STRING
        f.label = descriptor_pb2.FieldDescriptorProto.LABEL_OPTIONAL
    f = cs.field.add()
    f.name, f.number = "authors", 3
    f.type = descriptor_pb2.FieldDescriptorProto.TYPE_STRING
    f.label = descriptor_pb2.FieldDescriptorProto.LABEL_REPEATED
    f = cs.field.add()
    f.name, f.number = "scenario_predictions", 7
    f.type = descriptor_pb2.FieldDescriptorProto.TYPE_MESSAGE
    f.type_name = ".t.ScenarioPrediction"
    f.label = descriptor_pb2.FieldDescriptorProto.LABEL_REPEATED

    pool.Add(fdp)
    msgs = message_factory.GetMessageClassesForFiles(["test_sub.proto"],
                                                     pool)
    CS = msgs["t.ChallengeSubmission"]

    sub = ChallengeSubmission(
        account_name="a", unique_method_name="m", authors=["p", "q"],
        scenario_predictions=[ScenarioPrediction(
            scenario_id="s1", waypoints=[Waypoint(b"1", b"2", b"3")])])
    parsed = CS()
    parsed.ParseFromString(sub.serialize())
    assert parsed.account_name == "a"
    assert list(parsed.authors) == ["p", "q"]
    assert parsed.scenario_predictions[0].scenario_id == "s1"
    assert parsed.scenario_predictions[0].waypoints[
        0].observed_vehicles_occupancy == b"1"
    assert parsed.scenario_predictions[0].waypoints[
        0].all_vehicles_flow == b"3"


def test_quantize_waypoints_parity():
    rng = np.random.RandomState(0)
    t, h, w = 3, 8, 8
    grids = WaypointGrids(
        observed_occupancy=jnp.asarray(rng.rand(1, t, h, w, 1),
                                       jnp.float32),
        occluded_occupancy=jnp.asarray(rng.rand(1, t, h, w, 1),
                                       jnp.float32),
        flow=jnp.asarray(rng.randn(1, t, h, w, 2) * 50, jnp.float32),
        flow_origin_occupancy=jnp.zeros((1, t, h, w, 1)))
    wps = quantize_waypoints(grids)
    assert len(wps) == t
    obs0 = np.frombuffer(
        zlib.decompress(wps[0].observed_vehicles_occupancy), np.uint8)
    expect = np.round(np.asarray(grids.observed_occupancy[:, 0]) *
                      255).astype(np.uint8).reshape(-1)
    np.testing.assert_array_equal(obs0, expect)
    flow0 = np.frombuffer(
        zlib.decompress(wps[0].all_vehicles_flow), np.int8)
    expect_f = np.clip(np.round(np.asarray(grids.flow[:, 0])), -128,
                       127).astype(np.int8).reshape(-1)
    np.testing.assert_array_equal(flow0, expect_f)


def test_shard_filename():
    assert (submission_shard_filename("/x/00042new.tfrecords") ==
            "occupancy_flow_submission.binproto-00042-of-00150")
    with pytest.raises(ValueError):
        submission_shard_filename("/x/whatever.tfrecords")


def test_load_scenario_ids_val_split(tmp_path):
    """--split val must read validation_scenario_ids.txt (reference
    inference.py:261-272 supports both id sets)."""
    from strajnet_tpu.infer.runner import load_scenario_ids

    (tmp_path / "testing_scenario_ids.txt").write_text("t1\nt2\n")
    (tmp_path / "validation_scenario_ids.txt").write_text("v1\nv2\nv3\n")
    assert load_scenario_ids(str(tmp_path), test=True) == {"t1", "t2"}
    assert load_scenario_ids(str(tmp_path), test=False) == {"v1", "v2", "v3"}
