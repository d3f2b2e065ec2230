from tsforge_spark.codec.gorilla import (  # noqa: F401
    decode_series,
    decode_timestamps,
    decode_values,
    encode_series,
    encode_timestamps,
    encode_values,
)
