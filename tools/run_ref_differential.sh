#!/bin/bash
# Differential parity vs the compiled reference classifier (FIXTURES.md §2-4).
# Compiles the reference OUTSIDE the repo, trains it with the conllNoTags
# preset on our rendered fixtures, tags held-out turns, and compares triples.
set -euo pipefail
DIR=${1:-/tmp/refdiff}
REFBUILD=/tmp/refbuild

# 1. fixtures from our deterministic generator
cd /root/repo
sbt -batch "runMain graft.tools.RefFixtures $DIR"

# 2. compile the reference (Jan-2009 javac source) once
if [ ! -f "$REFBUILD/classes/edu/stanford/nlp/ie/crf/CRFClassifier.class" ]; then
  rm -rf "$REFBUILD"; mkdir -p "$REFBUILD/classes"
  cp -r /root/reference/src "$REFBUILD/src"
  cd "$REFBUILD"
  # JDK 17 compatibility: 'yield' is a restricted identifier since Java 14;
  # the source is UTF-8 (javac 17 defaults to the platform charset)
  sed -i 's/return yield(/return this.yield(/; s/List<CoreLabel> s = yield();/List<CoreLabel> s = this.yield();/' \
    src/edu/stanford/nlp/trees/Tree.java
  javac -nowarn -encoding UTF-8 -d classes \
    $(find src/edu -name '*.java') 2> javac.log || {
      echo "javac failed; tail of log:"; tail -30 javac.log; exit 2; }
fi

# 3. train + tag with the reference CLI
cd "$REFBUILD"
java -Xmx4g -cp classes edu.stanford.nlp.ie.crf.CRFClassifier \
  -trainFile "$DIR/train.tsv" -serializeTo "$DIR/ref.ser.gz" \
  -conllNoTags true 2> "$DIR/ref_train.log"
java -Xmx2g -cp classes edu.stanford.nlp.ie.crf.CRFClassifier \
  -loadClassifier "$DIR/ref.ser.gz" -testFile "$DIR/test.tsv" \
  -conllNoTags true > "$DIR/ref_out.tsv" 2> "$DIR/ref_test.log"

# 4. triples from reference tags vs our pipeline -> P/R gate
cd /root/repo
sbt -batch "runMain graft.tools.RefCompare $DIR"
