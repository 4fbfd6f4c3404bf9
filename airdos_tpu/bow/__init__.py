from airdos_tpu.bow.vocabulary import (  # noqa: F401
    Vocabulary, train_vocabulary, load_dbow2_text,
)
