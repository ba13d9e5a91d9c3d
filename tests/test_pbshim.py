"""Unit tests for the vendored protobuf wire codec
(ibis_spark/_vendor/pbshim.py) that unlocks transformWithStateInPandas
in protobuf-less environments. Pure Python — no SparkSession.

The codec's end-to-end validation is the batch TWS run in
tests/test_streaming.py (the JVM parses every byte with real
protobuf-java); these tests pin the wire format against hand-computed
bytes so a codec regression fails fast and locally.
"""

import sys

import pytest

from ibis_spark._vendor import pbshim


@pytest.fixture(scope="module")
def mod():
    return pbshim.build_module()


def test_varint_roundtrip_edges():
    for v in (0, 1, 127, 128, 300, 2**32 - 1, 2**63 - 1, -1, -2**63):
        enc = pbshim._enc_varint(v)
        dec, pos = pbshim._dec_varint(enc, 0)
        assert pos == len(enc)
        # negatives decode as their 64-bit two's complement image
        assert dec == (v & pbshim._MASK64)


def test_known_wire_bytes(mod):
    # SetHandleState{state: INITIALIZED(2)} inside StatefulProcessorCall
    # (field 1) inside StateRequest (field 2):
    #   field2|wt2 len=4 -> field1|wt2 len=2 -> field1|wt0 value=2
    req = mod.StateRequest(
        statefulProcessorCall=mod.StatefulProcessorCall(
            setHandleState=mod.SetHandleState(state=mod.INITIALIZED)
        )
    )
    assert req.SerializeToString() == bytes.fromhex("12040a020802")


def test_explicit_zero_enum_serialized_and_default_read(mod):
    # explicitly-set zero enum goes on the wire (proto3 parsers treat it
    # identically to absent, so this is safe AND keeps oneofs simple)
    s = mod.SetHandleState(state=mod.PRE_INIT)
    assert s.SerializeToString() == bytes.fromhex("0800")
    # absent field reads as default
    s2 = mod.SetHandleState()
    assert s2.state == 0
    assert s2.SerializeToString() == b""


def test_string_bytes_and_negative_int(mod):
    t = mod.TimerStateCallCommand()  # no-arg construction works
    r = mod.RegisterTimer(expiryTimestampMs=-5)
    out = mod.RegisterTimer()
    out.ParseFromString(r.SerializeToString())
    assert out.expiryTimestampMs == -5
    c = mod.StateCallCommand(stateName="s1", schema="a INT")
    back = mod.StateCallCommand()
    back.ParseFromString(c.SerializeToString())
    assert (back.stateName, back.schema) == ("s1", "a INT")
    assert isinstance(t, pbshim.Message)


def test_repeated_bytes_roundtrip_and_packed_parse(mod):
    put = mod.ListStatePut(value=[b"ab", b"", b"xyz"], fetchWithArrow=True)
    back = mod.ListStatePut()
    back.ParseFromString(put.SerializeToString())
    assert back.value == [b"ab", b"", b"xyz"]
    assert back.fetchWithArrow is True
    # packed form of a repeated varint field must also parse: synthesize
    # a message spec with a repeated int64 field
    spec = pbshim._FieldSpec.__new__(pbshim._FieldSpec)
    spec.name, spec.number, spec.type = "xs", 1, 3
    spec.repeated, spec.type_name = True, ""
    cls = type("Packed", (pbshim.Message,), {"_specs": {"xs": spec}})
    m = cls()
    # field1|wt2, len=3, varints 1,2,300 -> 0a 04 01 02 ac 02
    m.ParseFromString(bytes.fromhex("0a040102ac02"))
    assert m.xs == [1, 2, 300]


def test_unknown_fields_skipped(mod):
    # field 15 varint + field 14 length-delimited, unknown to StateResponse
    payload = bytes.fromhex("780172036162630805")
    r = mod.StateResponse()
    r.ParseFromString(payload)
    assert r.statusCode == 5  # field 1 still decoded


def test_response_defaults_and_fields(mod):
    r = mod.StateResponse()
    r.ParseFromString(b"")
    assert (r.statusCode, r.errorMessage, r.value) == (0, "", b"")
    lg = mod.StateResponseWithListGet()
    lg.ParseFromString(b"")
    assert lg.value == [] and lg.requireNextFetch is False


def test_descriptor_matches_pyspark_pyi(mod):
    # spot-check the parsed schema against pyspark's generated stubs
    sr = mod.StateRequest._specs
    assert sr["version"].number == 1
    assert sr["statefulProcessorCall"].number == 2
    assert sr["utilsRequest"].number == 6
    assert mod.PRE_INIT == 0 and mod.CREATED == 1 and mod.CLOSED == 5
    for name in (
        "StateResponse", "ValueStateCall", "ListStateCall", "MapStateCall",
        "TimerRequest", "KeyAndValuePair", "StateResponseWithTimer",
    ):
        assert hasattr(mod, name), name


def test_install_registers_pyspark_module_name():
    try:
        import google.protobuf  # noqa: F401

        pytest.skip("real protobuf present; shim install is a no-op")
    except ImportError:
        pass
    assert pbshim.install() is True
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    assert sm.__doc__.startswith("ibis_spark._vendor.pbshim")
    m = sm.StateRequest(version=2)
    assert m.SerializeToString() == bytes.fromhex("0802")
    assert sys.modules["pyspark.sql.streaming.proto.StateMessage_pb2"] is sm


def test_packed_fixed_width_parse():
    """Packed repeated fixed64/double/fixed32 (wire type 2) must be
    unpacked in calcsize strides, not struct.unpack'd whole (ADVICE
    r10: StateMessage has no such field today, but a regenerated
    descriptor could introduce one)."""
    import struct as _s

    def mk(ptype):
        spec = pbshim._FieldSpec.__new__(pbshim._FieldSpec)
        spec.name, spec.number, spec.type = "xs", 1, ptype
        spec.repeated, spec.type_name = True, ""
        return type("PackedF", (pbshim.Message,), {"_specs": {"xs": spec}})()

    # packed double: field1|wt2, len=16, two <d values
    payload = _s.pack("<dd", 1.5, -2.25)
    m = mk(pbshim._T_DOUBLE)
    m.ParseFromString(bytes([0x0A, len(payload)]) + payload)
    assert m.xs == [1.5, -2.25]
    # packed fixed32
    payload = _s.pack("<II", 7, 2**32 - 1)
    m = mk(pbshim._T_FIXED32)
    m.ParseFromString(bytes([0x0A, len(payload)]) + payload)
    assert m.xs == [7, 2**32 - 1]
    # unpacked encoding of the same field type still parses
    m2 = mk(pbshim._T_DOUBLE)
    m2.ParseFromString(bytes([0x09]) + _s.pack("<d", 3.5))
    assert m2.xs == [3.5]
