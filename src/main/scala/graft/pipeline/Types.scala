package graft.pipeline

import java.sql.Timestamp

/** The input table shape (BASELINE.json input_hint): an Iceberg/parquet table
  * of multi-turn conversation transcripts.
  */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp)

/** A turn with pre-tokenized words and gold labels (training fixture shape;
  * the reference consumes the same tokens rendered to column format,
  * /root/reference/src/edu/stanford/nlp/sequences/ColumnDocumentReaderAndWriter.java:46-72).
  */
final case class GoldTurn(
    conv_id: String,
    turn_idx: Int,
    words: Seq[String],
    labels: Seq[String])

/** One tagged token (per-token classifier output, slashTags-equivalent). */
final case class TaggedToken(
    conv_id: String,
    turn_idx: Int,
    sent_idx: Int,
    token_idx: Int,
    word: String,
    begin_char: Int,
    end_char: Int,
    answer: String)

/** An entity mention span with character offsets into the turn text
  * (reference semantic: classifyToCharacterOffsets label-change segmentation,
  * /root/reference/src/edu/stanford/nlp/ie/AbstractSequenceClassifier.java:473-516).
  */
final case class Mention(
    conv_id: String,
    turn_idx: Int,
    sent_idx: Int,
    etype: String,
    begin_char: Int,
    end_char: Int,
    surface: String)

/** An extracted (subj, pred, obj) triple, the KG edge seed. */
final case class Triple(
    conv_id: String,
    turn_idx: Int,
    subj: String,
    subj_type: String,
    pred: String,
    obj: String,
    obj_type: String)
