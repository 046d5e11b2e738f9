"""Conf-string encryption, the twin of ``EventHubsUtils.scala:178-207``.

The reference encrypts the connection string the moment it enters the
conf (``EventHubsConf.setConnectionString``,
``EventHubsConf.scala:137-139``) and decrypts on read
(``connectionString``, :141-144; ``toConf``, :727-731), keeping the
raw secret out of Spark option maps, UIs, and logs. Note this is
*obfuscation parity with the reference, not confidentiality*: the key
is derived from the public connector-version constant, so anyone with
the code can decrypt — the construction stops casual exposure, not an
attacker. Same construction here:

- key: PBKDF2-HmacSHA256(password = connector version, salt =
  connector version bytes, 1000 iterations, 256 bits) —
  ``EventHubsUtils.getSecretKeySpec`` (stdlib ``hashlib.pbkdf2_hmac``);
- cipher: AES/ECB with PKCS5 padding (PKCS5 == PKCS7 at AES's 16-byte
  block), base64-wrapped — ``EventHubsUtils.encrypt/decrypt``;
- plus the plain base64 ``encode``/``decode`` helpers.

The AES primitive comes from the ``cryptography`` package; when that
is absent the conf degrades to storing plaintext (reads handle both —
see ``decrypt_or_plaintext``), so the engine never hard-requires the
dependency.
"""

from __future__ import annotations

import base64
import hashlib
import logging
from typing import Optional

log = logging.getLogger(__name__)
_warned_plaintext = False

# twin of package.scala:65 (SparkConnectorVersion = "2.3.20"); our own
# connector's version string plays the same password+salt role
CONNECTOR_VERSION = "1.0.0"

_PBKDF2_ITERATIONS = 1000
_KEY_BITS = 256


def encode(s: str) -> str:
    """base64(utf-8) — EventHubsUtils.encode."""
    return base64.b64encode(s.encode("utf-8")).decode("ascii")


def decode(s: str) -> str:
    """EventHubsUtils.decode."""
    return base64.b64decode(s.encode("ascii")).decode("utf-8")


def _key() -> bytes:
    return hashlib.pbkdf2_hmac(
        "sha256",
        CONNECTOR_VERSION.encode("utf-8"),
        CONNECTOR_VERSION.encode("utf-8"),
        _PBKDF2_ITERATIONS,
        dklen=_KEY_BITS // 8,
    )


def _aes_ecb():
    try:
        from cryptography.hazmat.primitives.ciphers import (
            Cipher,
            algorithms,
            modes,
        )
    except ImportError:
        return None
    return Cipher(algorithms.AES(_key()), modes.ECB())


def encrypt(s: str) -> str:
    """AES-ECB-PKCS5 + base64 of ``s`` (obfuscation parity with the
    reference — the key derives from a public constant). Degrades to
    plaintext passthrough when the cipher backend is unavailable,
    logging a one-time warning so the downgrade is visible."""
    global _warned_plaintext
    cipher = _aes_ecb()
    if cipher is None:
        if not _warned_plaintext:
            _warned_plaintext = True
            log.warning(
                "cryptography package unavailable: connection string is "
                "stored in the conf as PLAINTEXT (no obfuscation)"
            )
        return s
    data = s.encode("utf-8")
    pad = 16 - len(data) % 16
    data += bytes([pad]) * pad
    enc = cipher.encryptor()
    return base64.b64encode(enc.update(data) + enc.finalize()).decode("ascii")


def decrypt(s: str) -> str:
    """Inverse of :func:`encrypt`; raises ``ValueError`` when ``s`` is
    not a valid ciphertext."""
    cipher = _aes_ecb()
    if cipher is None:
        raise ValueError("cipher backend unavailable")
    try:
        raw = base64.b64decode(s.encode("ascii"), validate=True)
        if not raw or len(raw) % 16:
            raise ValueError("not a block-aligned ciphertext")
        dec = cipher.decryptor()
        data = dec.update(raw) + dec.finalize()
        pad = data[-1]
        if not 1 <= pad <= 16 or data[-pad:] != bytes([pad]) * pad:
            raise ValueError("bad padding")
        return data[:-pad].decode("utf-8")
    except ValueError:
        raise
    except Exception as e:
        raise ValueError(f"not a valid ciphertext: {e}") from e


def decrypt_or_plaintext(s: Optional[str]) -> Optional[str]:
    """Read-side tolerance: the reference's ``toConf`` assumes every
    conf map carries ciphertext because ``setConnectionString`` always
    encrypts. This engine additionally accepts a plaintext value (confs
    built before encryption existed, hand-written option maps, or a
    missing cipher backend) — a decrypt failure returns the input
    unchanged instead of erroring."""
    if s is None:
        return None
    try:
        out = decrypt(s)
    except ValueError:
        return s
    # Guard against a pathological plaintext that happens to be valid
    # base64 of block-aligned bytes with coincidentally valid padding
    # decoding as UTF-8: a "successful" decrypt of such input yields
    # garbage that only fails much later, in ConnectionStringBuilder,
    # with a confusing error. A real decrypted connection string always
    # carries Endpoint=; anything else means the input was plaintext.
    if "Endpoint=" not in out and "Endpoint=" in s:
        return s
    return out
