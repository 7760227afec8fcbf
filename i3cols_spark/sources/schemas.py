"""Schema registry — the i3cols ``dtypes.py`` analog.

The reference defines NumPy structured dtypes mirroring IceCube frame
classes (i3cols/dtypes.py: I3EVENTHEADER_T, I3PARTICLE_T with nested
I3POSITION_T/I3DIRECTION_T/I3TIME_T, PULSE_T, TRIGGER_T, OMKEY_T,
START_STOP_T — SURVEY §1.1).  Here each becomes a ``StructType``
constant; the ragged ``(start, stop)`` index type disappears because
ArrayType columns carry their own offsets (SURVEY §1.2).

Enums (i3cols/enums.py analog) are plain dicts plus a helper that
builds a broadcastable dimension DataFrame for decode joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# I3TIME_T: integer UTC-year + DAQ time in tenths of ns.  Spark has no
# ns timestamp, so the canonical engine rule applies: µs TimestampType
# for query semantics + long tick column for full precision.
I3TIME_T = T.StructType(
    [
        T.StructField("utc_year", T.IntegerType(), False),
        T.StructField("utc_daq_time", T.LongType(), False),  # 0.1 ns ticks
    ]
)

I3EVENTHEADER_T = T.StructType(
    [
        T.StructField("run_id", T.LongType(), False),
        T.StructField("sub_run_id", T.LongType(), False),
        T.StructField("event_id", T.LongType(), False),
        T.StructField("sub_event_id", T.IntegerType(), True),
        T.StructField("sub_event_stream", T.StringType(), True),
        T.StructField("start_time", I3TIME_T, True),
        T.StructField("end_time", I3TIME_T, True),
    ]
)

I3POSITION_T = T.StructType(
    [
        T.StructField("x", T.DoubleType(), False),
        T.StructField("y", T.DoubleType(), False),
        T.StructField("z", T.DoubleType(), False),
    ]
)

I3DIRECTION_T = T.StructType(
    [
        T.StructField("zenith", T.DoubleType(), False),
        T.StructField("azimuth", T.DoubleType(), False),
    ]
)

I3PARTICLE_T = T.StructType(
    [
        T.StructField("pos", I3POSITION_T, True),
        T.StructField("dir", I3DIRECTION_T, True),
        T.StructField("time", T.DoubleType(), True),
        T.StructField("energy", T.DoubleType(), True),
        T.StructField("length", T.DoubleType(), True),
        T.StructField("pdg_encoding", T.IntegerType(), True),
        T.StructField("shape", T.IntegerType(), True),
        T.StructField("fit_status", T.IntegerType(), True),
    ]
)

PULSE_T = T.StructType(
    [
        T.StructField("time", T.DoubleType(), False),
        T.StructField("charge", T.FloatType(), False),
        T.StructField("width", T.FloatType(), True),
        T.StructField("flags", T.IntegerType(), True),
    ]
)

OMKEY_T = T.StructType(
    [
        T.StructField("string", T.IntegerType(), False),
        T.StructField("om", T.IntegerType(), False),
        T.StructField("pmt", T.ByteType(), True),
    ]
)

#: FLAT_PULSE_T: one row per (event, om, pulse) — the exploded child
#: table form of the ragged pulse-series map.
FLAT_PULSE_T = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("key", OMKEY_T, False),
        T.StructField("pulse", PULSE_T, False),
    ]
)

TRIGGER_T = T.StructType(
    [
        T.StructField("time", T.DoubleType(), False),
        T.StructField("length", T.DoubleType(), True),
        T.StructField("fired", T.BooleanType(), True),
        T.StructField("config_id", T.IntegerType(), True),
        T.StructField("type", T.IntegerType(), True),
    ]
)

#: The full reference-shaped event row: scalar header struct + ragged
#: ArrayType columns (the data.npy+index.npy pair, SURVEY §1.2).
I3_EVENT_T = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("header", I3EVENTHEADER_T, False),
        T.StructField("particle", I3PARTICLE_T, True),
        T.StructField("pulses", T.ArrayType(PULSE_T), True),
        T.StructField("triggers", T.ArrayType(TRIGGER_T), True),
    ]
)

# --- enums (i3cols/enums.py analog) ----------------------------------
# Code→name maps mirroring the public icetray dataclasses enums
# (I3Particle.h ParticleType/FitStatus/ParticleShape/LocationType,
# TriggerKey.h SourceID/TypeID).  Values follow the PDG Monte Carlo
# numbering scheme where the reference does; any registry dict plugs
# into ``enum_dim`` for a broadcast decode join (S14) — the registry's
# breadth costs nothing at runtime because only the dims a query joins
# are ever materialized.
PARTICLE_TYPE = {
    0: "unknown",
    22: "Gamma",
    11: "EMinus",
    -11: "EPlus",
    13: "MuMinus",
    -13: "MuPlus",
    15: "TauMinus",
    -15: "TauPlus",
    12: "NuE",
    -12: "NuEBar",
    14: "NuMu",
    -14: "NuMuBar",
    16: "NuTau",
    -16: "NuTauBar",
    111: "Pi0",
    211: "PiPlus",
    -211: "PiMinus",
    130: "K0_Long",
    310: "K0_Short",
    321: "KPlus",
    -321: "KMinus",
    2112: "Neutron",
    2212: "PPlus",
    -2212: "PMinus",
    1000010020: "H2Nucleus",
    1000020040: "He4Nucleus",
    1000060120: "C12Nucleus",
    1000080160: "O16Nucleus",
    1000260560: "Fe56Nucleus",
}

FIT_STATUS = {
    -1: "NotSet",
    0: "OK",
    10: "GeneralFailure",
    20: "InsufficientHits",
    30: "FailedToConverge",
    40: "MissingSeed",
    50: "InsufficientQuality",
}

PARTICLE_SHAPE = {
    0: "Null",
    10: "Primary",
    20: "TopShower",
    30: "Cascade",
    40: "CascadeSegment",
    50: "InfiniteTrack",
    60: "StartingTrack",
    70: "StoppingTrack",
    80: "ContainedTrack",
    90: "MCTrack",
    100: "Dark",
}

LOCATION_TYPE = {
    0: "Anywhere",
    10: "IceTop",
    20: "InIce",
    30: "InActiveVolume",
}

TRIGGER_SOURCE_ID = {
    0: "IN_ICE",
    10: "ICE_TOP",
    20: "AMANDA_TWR_DAQ",
    30: "EXTERNAL",
    40: "GLOBAL",
    50: "AMANDA_MUON_DAQ",
    70: "SPASE",
    80: "UNKNOWN_SOURCE",
}

TRIGGER_TYPE_ID = {
    0: "SIMPLE_MULTIPLICITY",
    10: "CALIBRATION",
    20: "MIN_BIAS",
    30: "THROUGHPUT",
    40: "TWO_COINCIDENCE",
    50: "THREE_COINCIDENCE",
    70: "MERGED",
    80: "SLOW_PARTICLE",
    105: "FRAGMENT_MULTIPLICITY",
    120: "STRING",
    125: "VOLUME",
    127: "SPHERE",
    129: "UNBIASED",
    170: "SPASE_2",
    180: "UNKNOWN_TYPE",
}

#: Name → dict registry, so CLI/config layers can look an enum up by
#: its reference name (i3cols/enums.py exposes the same flat module
#: namespace).
ENUMS: dict[str, dict[int, str]] = {
    "ParticleType": PARTICLE_TYPE,
    "FitStatus": FIT_STATUS,
    "ParticleShape": PARTICLE_SHAPE,
    "LocationType": LOCATION_TYPE,
    "TriggerSourceID": TRIGGER_SOURCE_ID,
    "TriggerTypeID": TRIGGER_TYPE_ID,
}


def enum_dim(spark: SparkSession, mapping: dict[int, str], code_col: str = "code", name_col: str = "name") -> DataFrame:
    """Broadcastable dimension table for enum decode joins (the scalable
    alternative to chained CASE WHEN for large enums — S14)."""
    return spark.createDataFrame(
        [(k, v) for k, v in mapping.items()],
        T.StructType(
            [
                T.StructField(code_col, T.IntegerType(), False),
                T.StructField(name_col, T.StringType(), False),
            ]
        ),
    )
