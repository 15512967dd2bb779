package iresearchspark.kms;

import java.util.Base64;
import java.util.HashMap;
import java.util.Map;
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
 * "iresearch.encryption.key.list" as comma-separated "name:base64"
 * entries, exactly the deployment shape of a vault-injected secret:
 * the wrapped (AES-GCM, KeyToolkit local wrapping) data keys live in
 * the parquet footers, the master keys only in the running session.
 *
 * Swap this class for a real KMS client (parquet.encryption.kms.client.class)
 * to back the same index files with an external key service - nothing
 * in the index format changes, which mirrors how the reference lets
 * deployments plug rocksdb/openssl ciphers under the same interface.
 */
public class ConfKmsClient implements KmsClient {
  public static final String KEY_LIST_PROPERTY_NAME =
      "iresearch.encryption.key.list";

  private final Map<String, byte[]> masterKeys = new HashMap<>();

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
              + " (comma-separated name:base64 entries)");
    }
    for (String entry : keys) {
      int sep = entry.indexOf(':');
      if (sep <= 0 || sep == entry.length() - 1) {
        throw new ParquetCryptoRuntimeException(
            "bad master-key entry (want name:base64): " + entry);
      }
      byte[] key = Base64.getDecoder().decode(entry.substring(sep + 1));
      if (key.length != 16 && key.length != 24 && key.length != 32) {
        throw new ParquetCryptoRuntimeException(
            "master key '" + entry.substring(0, sep)
                + "' must be 16/24/32 bytes, got " + key.length);
      }
      masterKeys.put(entry.substring(0, sep), key);
    }
  }

  private byte[] masterKey(String id) {
    byte[] key = masterKeys.get(id);
    if (key == null) {
      throw new KeyAccessDeniedException("unknown master key: " + id);
    }
    return key;
  }

  @Override
  public String wrapKey(byte[] keyBytes, String masterKeyIdentifier) {
    return KeyToolkit.encryptKeyLocally(
        keyBytes, masterKey(masterKeyIdentifier), null);
  }

  @Override
  public byte[] unwrapKey(String wrappedKey, String masterKeyIdentifier) {
    return KeyToolkit.decryptKeyLocally(
        wrappedKey, masterKey(masterKeyIdentifier), null);
  }
}
