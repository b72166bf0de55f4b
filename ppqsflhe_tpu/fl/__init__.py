from .api import (  # noqa: F401
    gen_cc, key_gen, rekey_gen, encrypt_weights, decrypt_weights,
    change_cipher_domain, aggregate_encrypted_weights,
)
