"""Index encryption — the reference's pluggable at-rest cipher, mapped
to Parquet Modular Encryption.

The reference engine exposes encryption as a runtime-provided provider
attached to the directory (`irs::encryption`,
core/store/directory_attributes.hpp:32-65): every index file gets a
cipher header and its bytes are encrypted with an offset-addressable
stream (core/utils/encryption.hpp, ctr_encryption.hpp — CTR mode over a
user-plugged block cipher); keys live only in the running process,
never in the index. The engine itself ships no production cipher —
deployments plug one in (ArangoDB plugs RocksDB/OpenSSL AES).

The Spark-native equivalent is Parquet Modular Encryption (the storage
layer the index actually uses): every index table is written with
AES-GCM-encrypted pages AND an encrypted footer (file magic flips
`PAR1` -> `PARE`), so data, statistics, and schema are all sealed at
rest, while Spark scans decrypt transparently — predicate pushdown and
row-group pruning keep working because the (encrypted) min/max stats
are readable to a keyed reader. Wrapped data keys ride in the parquet
footers; MASTER keys come from a `KmsClient`, the same plug-point as
the reference's cipher provider. The bundled client
(`iresearchspark.kms.ConfKmsClient`, jars/iresearch-kms.jar) reads
master keys from the Hadoop configuration — the vault-injected-secret
deployment shape; swap `kms_client_class` for a real KMS client on a
production cluster and nothing in the index format changes.

Trade-off recorded honestly: the plaintext per-file term-range maps the
manifest normally carries (the burst-trie block-index analogue) are
OMITTED for encrypted indexes — they would leak the vocabulary into
`manifest.json`. Term-dictionary seeks then rely on parquet row-group
statistics, which remain available to keyed readers after footer
decryption, so pruning degrades from file-level to row-group-level,
not to a full scan. Doc-id ranges (opaque integers) are kept.

At 100 TB this is the right layer for encryption: it is executor-local
CPU work folded into the parquet codec path (no extra shuffle, no
driver involvement), and key rotation is `KeyToolkit.rotateMasterKeys`
on the footers without rewriting data.

Usage::

    enc = IndexEncryption({"k0": IndexEncryption.generate_key()})
    index.save(path, encryption=enc)
    ix = InvertedIndex.load(spark, path, encryption=enc)

On spark-submit clusters add `--jars jars/iresearch-kms.jar` (local
sessions hot-load it via addJar).
"""

from __future__ import annotations

import base64
import os
import secrets

DEFAULT_KMS_CLIENT = "iresearchspark.kms.ConfKmsClient"
CRYPTO_FACTORY = (
    "org.apache.parquet.crypto.keytools.PropertiesDrivenCryptoFactory"
)
KEY_LIST_PROPERTY = "iresearch.encryption.key.list"
_VALID_KEY_LENS = (16, 24, 32)


def _kms_jar_path() -> str | None:
    """The bundled ConfKmsClient jar, when running from the repo
    checkout (spark-submit deployments pass --jars instead)."""
    p = os.environ.get("IRESEARCH_KMS_JAR")
    if p and os.path.exists(p):
        return p
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)
    )))
    p = os.path.join(here, "jars", "iresearch-kms.jar")
    return p if os.path.exists(p) else None


class IndexEncryption:
    """Master-key provider for encrypted index saves/loads.

    `master_keys` maps key names to raw 16/24/32-byte AES keys — or,
    for rotation support, to a {version: key} dict of key VERSIONS
    (wrap always uses the newest; unwrap uses the version recorded in
    the wrapped material). Every index table is uniformly encrypted
    (pages + footer) under a data key wrapped by `footer_key`
    (default: the first master key) — the whole-index-opaque posture
    of the reference's directory-level encryption. Keys never touch
    the index directory: the manifest records only the KMS class and
    the key NAME.

    `external_key_material=True` writes the wrapped key material to
    `_KEY_MATERIAL_FOR_*.json` sidecar files instead of the parquet
    footers — the prerequisite for `rotate_master_keys`, which re-keys
    an index by rewriting ONLY those sidecars (no data rewrite: at
    100 TB, rotation touches kilobytes).
    """

    def __init__(
        self,
        master_keys: dict[str, bytes],
        footer_key: str | None = None,
        kms_client_class: str = DEFAULT_KMS_CLIENT,
        external_key_material: bool = False,
    ):
        if not master_keys:
            raise ValueError("master_keys must not be empty")
        for name, val in master_keys.items():
            if ":" in name or "," in name or "@" in name:
                raise ValueError(
                    f"key name {name!r} may not contain ':' ',' '@'"
                )
            versions = (
                val if isinstance(val, dict) else {1: val}
            )
            if not versions:
                raise ValueError(f"key {name!r} has no versions")
            for v, key in versions.items():
                if not isinstance(v, int) or v < 1:
                    raise ValueError(
                        f"key {name!r} version must be a positive int"
                    )
                if len(key) not in _VALID_KEY_LENS:
                    raise ValueError(
                        f"master key {name!r} (v{v}) must be 16/24/32"
                        f" bytes, got {len(key)}"
                    )
        self.master_keys = dict(master_keys)
        self.external_key_material = bool(external_key_material)
        self.footer_key = footer_key or next(iter(master_keys))
        if self.footer_key not in self.master_keys:
            raise ValueError(f"footer_key {self.footer_key!r} not in keys")
        self.kms_client_class = kms_client_class

    @classmethod
    def from_key_file(
        cls, path: str, footer_key: str | None = None
    ) -> "IndexEncryption":
        """Load master keys from a secrets file (one `name:base64` or
        `name@vN:base64` per line, '#' comments) — the vault-injected-
        file deployment shape for spark-submit jobs. The file is read
        driver-side only and its contents never reach the index
        directory."""
        keys: dict = {}
        with open(path) as f:
            for ln in f:
                ln = ln.strip()
                if not ln or ln.startswith("#"):
                    continue
                name, _, b64 = ln.partition(":")
                if not _ or not b64:
                    raise ValueError(
                        f"bad key line (want name[@vN]:base64): {ln[:30]!r}"
                    )
                raw = base64.b64decode(b64)
                base, _, ver = name.partition("@v")
                if ver:
                    keys.setdefault(base, {})[int(ver)] = raw
                else:
                    keys[name] = raw
        return cls(keys, footer_key=footer_key)

    @staticmethod
    def generate_key(length: int = 16) -> bytes:
        if length not in _VALID_KEY_LENS:
            raise ValueError("AES key length must be 16/24/32")
        return secrets.token_bytes(length)

    # -------------------------------------------------- session wiring

    def apply(self, spark) -> None:
        """Arm the running session: hot-load the KMS jar (once) and set
        the crypto-factory + master-key Hadoop properties. Idempotent;
        affects only writes that pass write_options() and reads of
        encrypted files — plaintext tables are untouched."""
        jar = _kms_jar_path()
        sc = spark.sparkContext
        hconf = sc._jsc.hadoopConfiguration()
        if jar is not None and not getattr(sc, "_iresearch_kms_jar", False):
            # executors: task classloaders pick the jar up from addJar
            sc._jsc.sc().addJar(jar)
            # driver: Configuration.getClassByName (used by KeyToolkit
            # entry points called via py4j, e.g. key rotation) resolves
            # through the configuration's OWN classloader, which addJar
            # does not touch — chain a URLClassLoader over the jar
            jvm = sc._jvm
            url = jvm.java.io.File(jar).toURI().toURL()
            urls = sc._gateway.new_array(jvm.java.net.URL, 1)
            urls[0] = url
            loader = jvm.java.net.URLClassLoader(
                urls,
                jvm.java.lang.Thread.currentThread().getContextClassLoader(),
            )
            hconf.setClassLoader(loader)
            sc._iresearch_kms_jar = True
        key_list = self.key_list()
        if hconf.get(KEY_LIST_PROPERTY) != key_list:
            # KeyToolkit caches unwrapped KEKs JVM-wide (per access
            # token); a session re-armed with DIFFERENT master keys
            # must not keep serving keys unwrapped under the old ones
            try:
                sc._jvm.org.apache.parquet.crypto.keytools.KeyToolkit.removeCacheEntriesForAllTokens()
            except Exception:
                pass
        hconf.set("parquet.crypto.factory.class", CRYPTO_FACTORY)
        hconf.set("parquet.encryption.kms.client.class", self.kms_client_class)
        hconf.set(KEY_LIST_PROPERTY, key_list)

    def key_list(self) -> str:
        parts = []
        for n, val in self.master_keys.items():
            if isinstance(val, dict):
                for v, k in sorted(val.items()):
                    parts.append(
                        f"{n}@v{v}:{base64.b64encode(k).decode()}"
                    )
            else:
                parts.append(f"{n}:{base64.b64encode(val).decode()}")
        return ",".join(parts)

    def write_options(self) -> dict[str, str]:
        """Per-write parquet options: uniform encryption of every
        column + the footer under the footer key's data key."""
        opts = {"parquet.encryption.uniform.key": self.footer_key}
        if self.external_key_material:
            opts["parquet.encryption.key.material.store.internally"] = (
                "false"
            )
        return opts

    def manifest_record(self) -> dict:
        """What the index manifest records — names only, never keys."""
        return {
            "kms_client_class": self.kms_client_class,
            "footer_key": self.footer_key,
            "algorithm": "AES_GCM_V1",
            "external_key_material": self.external_key_material,
        }

    # -------------------------------------------------- key rotation

    def rotate_master_keys(self, spark, index_path: str) -> int:
        """Re-key an index in place: every `_KEY_MATERIAL_FOR_*.json`
        sidecar is unwrapped with the master-key VERSION it records and
        re-wrapped with the NEWEST version in this provider — data
        pages are untouched (KeyToolkit.rotateMasterKeys per table
        directory). Requires the index to have been written with
        external_key_material=True. After rotation, a session holding
        only the newest key version can read the index and sessions
        holding only retired versions cannot. Returns the number of
        table directories rotated.

        This is the at-scale re-key path: at 10^12 docs the sidecars
        are kilobytes per file while the data is terabytes."""
        self.apply(spark)
        dirs = sorted(
            {
                root
                for root, _d, files in os.walk(index_path)
                if any(f.startswith("_KEY_MATERIAL_FOR_") for f in files)
            }
        )
        if not dirs:
            raise ValueError(
                f"no external key material under {index_path}: the index"
                " must be saved with"
                " IndexEncryption(external_key_material=True) to support"
                " rotation"
            )
        jvm = spark.sparkContext._jvm
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        toolkit = jvm.org.apache.parquet.crypto.keytools.KeyToolkit
        for d in dirs:
            toolkit.rotateMasterKeys(d, hconf)
        # drop cached KEKs unwrapped under pre-rotation material
        toolkit.removeCacheEntriesForAllTokens()
        return len(dirs)
