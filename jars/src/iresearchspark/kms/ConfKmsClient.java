package iresearchspark.kms;

import java.util.Base64;
import java.util.HashMap;
import java.util.Map;
import java.util.TreeMap;
import org.apache.hadoop.conf.Configuration;
import org.apache.parquet.crypto.KeyAccessDeniedException;
import org.apache.parquet.crypto.ParquetCryptoRuntimeException;
import org.apache.parquet.crypto.keytools.KeyToolkit;
import org.apache.parquet.crypto.keytools.KmsClient;

/**
 * Conf-supplied master-key KMS client for Parquet Modular Encryption.
 *
 * The index-encryption analogue of the reference engine's pluggable
 * at-rest cipher provider (irs::encryption in
 * core/store/directory_attributes.hpp:32-65: the directory holds a
 * runtime-provided key source; keys are never written into the index).
 * Master keys arrive through the Hadoop configuration property
 * "iresearch.encryption.key.list" as comma-separated entries, exactly
 * the deployment shape of a vault-injected secret: the wrapped
 * (AES-GCM, KeyToolkit local wrapping) data keys live in the parquet
 * footers (or external key-material files), the master keys only in
 * the running session.
 *
 * Entries are "name:base64" (version 1) or "name@vN:base64" - key
 * VERSIONS make KeyToolkit.rotateMasterKeys meaningful: wrapKey always
 * uses the newest version and records it in the wrapped blob
 * ("irv:N:..."), unwrapKey uses the recorded version, so rotation
 * re-wraps old key material under the newest master key without
 * touching data pages - the 100-TB operational story (re-key an index
 * by rewriting key material, not data).
 *
 * Swap this class for a real KMS client (parquet.encryption.kms.client.class)
 * to back the same index files with an external key service - nothing
 * in the index format changes, which mirrors how the reference lets
 * deployments plug rocksdb/openssl ciphers under the same interface.
 */
public class ConfKmsClient implements KmsClient {
  public static final String KEY_LIST_PROPERTY_NAME =
      "iresearch.encryption.key.list";
  private static final String VERSION_PREFIX = "irv:";

  private final Map<String, TreeMap<Integer, byte[]>> masterKeys =
      new HashMap<>();

  @Override
  public void initialize(
      Configuration conf,
      String kmsInstanceID,
      String kmsInstanceURL,
      String accessToken) {
    String[] keys = conf.getTrimmedStrings(KEY_LIST_PROPERTY_NAME);
    if (keys == null || keys.length == 0) {
      throw new ParquetCryptoRuntimeException(
          "no master keys in the session: set " + KEY_LIST_PROPERTY_NAME
              + " (comma-separated name:base64 or name@vN:base64 entries)");
    }
    for (String entry : keys) {
      int sep = entry.indexOf(':');
      if (sep <= 0 || sep == entry.length() - 1) {
        throw new ParquetCryptoRuntimeException(
            "bad master-key entry (want name[@vN]:base64): " + entry);
      }
      String name = entry.substring(0, sep);
      int version = 1;
      int at = name.indexOf("@v");
      if (at > 0) {
        try {
          version = Integer.parseInt(name.substring(at + 2));
        } catch (NumberFormatException e) {
          throw new ParquetCryptoRuntimeException(
              "bad key version in entry: " + entry);
        }
        name = name.substring(0, at);
      }
      byte[] key = Base64.getDecoder().decode(entry.substring(sep + 1));
      if (key.length != 16 && key.length != 24 && key.length != 32) {
        throw new ParquetCryptoRuntimeException(
            "master key '" + name + "' must be 16/24/32 bytes, got "
                + key.length);
      }
      masterKeys
          .computeIfAbsent(name, k -> new TreeMap<>())
          .put(version, key);
    }
  }

  private TreeMap<Integer, byte[]> versions(String id) {
    TreeMap<Integer, byte[]> v = masterKeys.get(id);
    if (v == null) {
      throw new KeyAccessDeniedException("unknown master key: " + id);
    }
    return v;
  }

  @Override
  public String wrapKey(byte[] keyBytes, String masterKeyIdentifier) {
    Map.Entry<Integer, byte[]> latest =
        versions(masterKeyIdentifier).lastEntry();
    return VERSION_PREFIX + latest.getKey() + ":"
        + KeyToolkit.encryptKeyLocally(keyBytes, latest.getValue(), null);
  }

  @Override
  public byte[] unwrapKey(String wrappedKey, String masterKeyIdentifier) {
    TreeMap<Integer, byte[]> vs = versions(masterKeyIdentifier);
    if (wrappedKey.startsWith(VERSION_PREFIX)) {
      int sep = wrappedKey.indexOf(':', VERSION_PREFIX.length());
      int version;
      try {
        version = Integer.parseInt(
            wrappedKey.substring(VERSION_PREFIX.length(), sep));
      } catch (RuntimeException e) {
        throw new ParquetCryptoRuntimeException(
            "corrupt wrapped-key version header");
      }
      byte[] key = vs.get(version);
      if (key == null) {
        throw new KeyAccessDeniedException(
            "master key " + masterKeyIdentifier + " version " + version
                + " not in the session (needed to unwrap; rotate or add"
                + " the old version)");
      }
      return KeyToolkit.decryptKeyLocally(
          wrappedKey.substring(sep + 1), key, null);
    }
    // material wrapped by a pre-versioning client: try newest..oldest
    ParquetCryptoRuntimeException last = null;
    for (byte[] key : vs.descendingMap().values()) {
      try {
        return KeyToolkit.decryptKeyLocally(wrappedKey, key, null);
      } catch (ParquetCryptoRuntimeException e) {
        last = e;
      }
    }
    throw last != null
        ? last
        : new ParquetCryptoRuntimeException("no key versions");
  }
}
