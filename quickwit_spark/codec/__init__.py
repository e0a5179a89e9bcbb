from quickwit_spark.codec.norms import (  # noqa: F401
    FIELD_NORMS_TABLE,
    fieldnorm_to_id,
    id_to_fieldnorm,
)
from quickwit_spark.codec.postings import (  # noqa: F401
    BLOCK_SIZE,
    decode_postings,
    encode_postings,
    varint_decode,
    varint_encode,
)
