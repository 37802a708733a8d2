from .ethereum import (  # noqa: F401
    ERC20_SELECTORS,
    ERC223_SELECTORS,
    BANCOR_CONVERTER_SELECTORS,
    TRANSFER_EVENT_TOPIC,
    BANCOR_CONVERSION_TOPIC,
    hex_word_to_float,
    keccak_selector,
    register_sql_functions,
    supply_rounded,
    topic_to_address,
    uint256_value,
)
