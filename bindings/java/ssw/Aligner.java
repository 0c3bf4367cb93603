package ssw;

import java.io.BufferedReader;
import java.io.InputStreamReader;
import java.io.OutputStreamWriter;
import java.io.Writer;
import java.nio.charset.StandardCharsets;

/**
 * Java client for the TPU-native SSW engine, with the same public API as
 * the reference's JNI binding (ref: src/ssw/Aligner.java:76-160): the raw
 * numeric {@code align(...)} entry point plus the safe overload that builds
 * a dynamic alphabet from the observed bytes, flattens a 128x128 matrix and
 * range-checks the penalties.
 *
 * Instead of dlopen'ing a native library into the JVM (the TPU runtime
 * cannot be embedded), the binding talks to a persistent worker process
 * ({@code python -m ssw_tpu.bridge}) over a JSON-lines pipe; one worker is
 * lazily started per JVM and batches are amortized across calls.
 */
public class Aligner {
    // bit 8 of the reference's flag byte: ALWAYS return begin + cigar
    // (ref: src/ssw/Aligner.java:39; 0x0f would arm the bit-6 distance
    // filter, which with the overload's filterdistance=0 suppresses every
    // cigar)
    public static final int FLAG_INCLUDE_BEST_ALIGNMENT_POSITION_AND_CIGAR = 0x01;
    public static final int MAX_SCORE_UNSURE = 2;

    private static Process worker;
    private static Writer toWorker;
    private static BufferedReader fromWorker;
    private static long nextId = 0;

    private static synchronized void ensureWorker() throws Exception {
        if (worker != null && worker.isAlive()) return;
        String python = System.getProperty("ssw.python", "python3");
        ProcessBuilder pb = new ProcessBuilder(python, "-m", "ssw_tpu.bridge");
        pb.redirectErrorStream(false);
        worker = pb.start();
        toWorker = new OutputStreamWriter(worker.getOutputStream(),
                StandardCharsets.UTF_8);
        fromWorker = new BufferedReader(new InputStreamReader(
                worker.getInputStream(), StandardCharsets.UTF_8));
    }

    /** Raw entry point; signature mirrors the reference's native method. */
    public static synchronized Alignment align(byte[] read,
            byte[] flattenedMatrix, int n, int score_size, byte[] ref,
            int gapOpen, int gapExtend, int flag, short filterscore,
            int filterdistance, int maskLen) {
        try {
            ensureWorker();
            long id = nextId++;
            StringBuilder sb = new StringBuilder();
            sb.append("{\"id\":").append(id)
              .append(",\"read\":").append(toJson(read))
              .append(",\"ref\":").append(toJson(ref))
              .append(",\"matrix\":").append(toJson(flattenedMatrix))
              .append(",\"n\":").append(n)
              .append(",\"score_size\":").append(score_size)
              .append(",\"gap_open\":").append(gapOpen)
              .append(",\"gap_extend\":").append(gapExtend)
              .append(",\"flag\":").append(flag)
              .append(",\"filter_score\":").append(filterscore)
              .append(",\"filter_distance\":").append(filterdistance)
              .append(",\"mask_len\":").append(maskLen)
              .append("}\n");
            toWorker.write(sb.toString());
            toWorker.flush();
            String line = fromWorker.readLine();
            if (line == null) throw new RuntimeException("worker died");
            return parse(line);
        } catch (Exception e) {
            throw new RuntimeException("ssw_tpu bridge failure", e);
        }
    }

    /**
     * Batched entry point (TPU-native extension; no reference
     * counterpart): many reads against one reference in ONE worker
     * round-trip, executed as one device batch by the engine.  Results
     * are positional; maskLen &lt; 0 selects the per-read default
     * max(15, readLen/2).
     */
    public static synchronized Alignment[] alignBatch(byte[][] reads,
            byte[] flattenedMatrix, int n, int score_size, byte[] ref,
            int gapOpen, int gapExtend, int flag, short filterscore,
            int filterdistance, int maskLen) {
        try {
            ensureWorker();
            long id = nextId++;
            StringBuilder sb = new StringBuilder();
            sb.append("{\"id\":").append(id).append(",\"batch\":[");
            for (int i = 0; i < reads.length; i++) {
                if (i > 0) sb.append(',');
                int ml = maskLen >= 0 ? maskLen
                        : Math.max(15, reads[i].length / 2);
                sb.append("{\"read\":").append(toJson(reads[i]))
                  .append(",\"ref\":").append(toJson(ref))
                  .append(",\"matrix\":").append(toJson(flattenedMatrix))
                  .append(",\"n\":").append(n)
                  .append(",\"score_size\":").append(score_size)
                  .append(",\"gap_open\":").append(gapOpen)
                  .append(",\"gap_extend\":").append(gapExtend)
                  .append(",\"flag\":").append(flag)
                  .append(",\"filter_score\":").append(filterscore)
                  .append(",\"filter_distance\":").append(filterdistance)
                  .append(",\"mask_len\":").append(ml)
                  .append('}');
            }
            sb.append("]}\n");
            toWorker.write(sb.toString());
            toWorker.flush();
            String line = fromWorker.readLine();
            if (line == null) throw new RuntimeException("worker died");
            if (line.contains("\"error\""))
                throw new RuntimeException("bridge error: " + line);
            // result is an array of objects; cigar strings contain only
            // [0-9MIDNSHP=X], so "},{" never appears inside a value
            int s = line.indexOf("\"result\":[") + 10;
            int e = line.lastIndexOf(']');
            String body = line.substring(s, e);
            if (body.isEmpty()) return new Alignment[0];
            java.util.List<String> items = new java.util.ArrayList<>();
            int depth = 0, start = 0;
            for (int i = 0; i < body.length(); i++) {
                char c = body.charAt(i);
                if (c == '{') depth++;
                else if (c == '}') depth--;
                else if (c == ',' && depth == 0) {
                    items.add(body.substring(start, i));
                    start = i + 1;
                }
            }
            items.add(body.substring(start));
            Alignment[] out = new Alignment[items.size()];
            for (int i = 0; i < out.length; i++) {
                String it = items.get(i);
                out[i] = it.equals("null") ? null : parse(it);
            }
            return out;
        } catch (Exception e) {
            throw new RuntimeException("ssw_tpu bridge failure", e);
        }
    }

    /**
     * Safe overload (ref: src/ssw/Aligner.java:88-106): dynamic alphabet,
     * penalty range checks, maskLen = max(15, len/2).
     */
    public static Alignment align(byte[] read, byte[] ref, int[][] matrix,
            int gapOpen, int gapExtend, boolean ignoreCase) {
        if (gapOpen < 0 || gapExtend < 0)
            throw new IllegalArgumentException(
                    "Gap open and extension penalties must be positive");
        if (gapOpen >= 256 || gapExtend >= 256)
            throw new IllegalArgumentException(
                    "Gap open and extension penalties must fit into unsigned 8-bit integer");
        int[] lookup = new int[257];
        java.util.Arrays.fill(lookup, -1);
        lookup[256] = 0;
        byte[] readNum = convertToNumeric(lookup, read, ignoreCase);
        byte[] refNum = convertToNumeric(lookup, ref, ignoreCase);
        byte[] flattenedMatrix = flatten(lookup, matrix);
        int uniqueBases = lookup[256];
        return align(readNum, flattenedMatrix, uniqueBases, MAX_SCORE_UNSURE,
                refNum, gapOpen, gapExtend,
                FLAG_INCLUDE_BEST_ALIGNMENT_POSITION_AND_CIGAR, (short) 0, 0,
                Math.max(15, readNum.length / 2));
    }

    private static byte[] convertToNumeric(int[] lookup, byte[] sequence,
            boolean ignoreCase) {
        byte[] numericSeq = new byte[sequence.length];
        for (int i = 0; i < sequence.length; i++) {
            int b = sequence[i];
            if (ignoreCase) b = Character.toUpperCase(b);
            if (lookup[b] == -1) lookup[b] = lookup[256]++;
            numericSeq[i] = (byte) lookup[b];
        }
        return numericSeq;
    }

    private static byte[] flatten(int[] lookup, int[][] matrix) {
        int size = lookup[256];
        byte[] flattened = new byte[size * size];
        for (int i = 0; i < matrix.length; i++) {
            int newi = i < 257 ? lookup[i] : -1;
            if (newi == -1) continue;
            for (int j = 0; j < matrix[i].length; j++) {
                int newj = j < 257 ? lookup[j] : -1;
                if (newj == -1) continue;
                int score = matrix[i][j];
                if (score < Byte.MIN_VALUE || score > Byte.MAX_VALUE)
                    throw new IllegalArgumentException(
                            "Scoring matrix values must fit into signed 8-bit integer");
                flattened[newi * size + newj] = (byte) score;
            }
        }
        return flattened;
    }

    // -- minimal JSON helpers (no external deps) -------------------------

    private static String toJson(byte[] arr) {
        StringBuilder sb = new StringBuilder("[");
        for (int i = 0; i < arr.length; i++) {
            if (i > 0) sb.append(',');
            sb.append(arr[i]);
        }
        return sb.append(']').toString();
    }

    private static int intField(String json, String name, int dflt) {
        int k = json.indexOf("\"" + name + "\":");
        if (k < 0) return dflt;
        int s = k + name.length() + 3;
        int e = s;
        while (e < json.length()
                && (json.charAt(e) == '-' || Character.isDigit(json.charAt(e))))
            e++;
        return Integer.parseInt(json.substring(s, e));
    }

    private static Alignment parse(String line) {
        if (line.contains("\"error\""))
            throw new RuntimeException("bridge error: " + line);
        if (line.contains("\"result\":null")) return null;
        String cigar = "";
        int k = line.indexOf("\"cigar_string\":");
        if (k >= 0) {
            int s = line.indexOf('"', k + 15) + 1;
            int e = line.indexOf('"', s);
            cigar = line.substring(s, e);
        }
        return new Alignment(
                (short) intField(line, "score1", 0),
                (short) intField(line, "score2", 0),
                intField(line, "ref_begin1", -1),
                intField(line, "ref_end1", 0),
                intField(line, "read_begin1", -1),
                intField(line, "read_end1", 0),
                intField(line, "ref_end2", 0),
                cigar);
    }
}
