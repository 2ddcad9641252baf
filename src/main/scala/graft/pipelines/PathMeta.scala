package graft.pipelines

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Filename-derived metadata helpers shared by the file pipelines. */
object PathMeta {

  /** `input_file_name()` returns the URL-ENCODED URI of the split's
    * file — a directory `GTEX 123.svs` arrives as `GTEX%20123.svs`.
    * Keys and paths derived from the raw value silently miss lookup
    * joins (the JSON lookups carry decoded names) and land output in
    * differently-named directories. This column percent-decodes it.
    *
    * `url_decode` is FORM decoding ('+' → space), but URI encoding
    * leaves a literal '+' in path segments unencoded — protect it as
    * %2B first so it round-trips. */
  def decodedInputFileName(): Column =
    url_decode(regexp_replace(input_file_name(), "\\+", "%2B"))
}
