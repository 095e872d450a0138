package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{ColumnBridge, NfcNormalize}

/** Name/label curation columns — the reference's member-curation
  * semantics (create_merged.py:187 curate_member, strip_eth at :347):
  * canonical Unicode form, case-fold, trim, suffix strip, whitespace
  * collapse. All codegen'd (NFC via the custom
  * [[org.apache.spark.sql.graft.NfcNormalize]] expression).
  */
object Normalize {

  def nfc(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))

  /** Strip a literal domain suffix (".eth" in the reference). */
  def stripSuffix(c: Column, suffix: String): Column =
    regexp_replace(c, java.util.regex.Pattern.quote(suffix) + "$", "")

  /** Canonical label: NFC → lower → trim → collapse inner runs of
    * whitespace to single spaces. The dedup/hash key for names. */
  def canonicalLabel(c: Column): Column =
    regexp_replace(lower(trim(nfc(c))), "\\s+", " ")

  /** Curated member name: canonical label with the registry suffix
    * removed — what the reference hashes into a namehash. */
  def curatedName(c: Column, suffix: String = ".eth"): Column =
    stripSuffix(canonicalLabel(c), suffix)

  /** keccak256 of the UTF-8 text, lowercase hex (label_to_hash,
    * create_merged.py:807 — Ethereum's pre-FIPS Keccak, not SHA3). */
  def keccak256(c: Column): Column =
    ColumnBridge.column(
      org.apache.spark.sql.graft.Keccak256Hex(ColumnBridge.expression(c)))

  /** ERC-137 namehash of a dot-separated name, 0x-prefixed hex
    * (normal_name_to_hash, create_merged.py:814-826). */
  def namehash(c: Column): Column =
    ColumnBridge.column(
      org.apache.spark.sql.graft.NamehashExpr(ColumnBridge.expression(c)))
}
