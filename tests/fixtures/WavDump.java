// Independent WAV decode reference (round 16): javax.sound.sampled's
// WAVE reader and its ULAW/ALAW-to-PCM converters are clean-room
// implementations unrelated to this repo's decoder AND to CPython's
// audioop, so sample agreement is a second independent G.711/PCM
// conformance source. Dumps "FILE <path> <channels> <rate> <n16>"
// followed by one signed 16-bit sample per line (interleaved,
// little-endian source order).
import java.io.File;
import javax.sound.sampled.AudioFormat;
import javax.sound.sampled.AudioInputStream;
import javax.sound.sampled.AudioSystem;

public class WavDump {
    public static void main(String[] args) throws Exception {
        for (String path : args) {
            AudioInputStream in =
                AudioSystem.getAudioInputStream(new File(path));
            AudioFormat f = in.getFormat();
            AudioFormat target = new AudioFormat(
                AudioFormat.Encoding.PCM_SIGNED, f.getSampleRate(), 16,
                f.getChannels(), f.getChannels() * 2, f.getSampleRate(),
                false);
            AudioInputStream pcm =
                AudioSystem.getAudioInputStream(target, in);
            byte[] buf = pcm.readAllBytes();
            System.out.println("FILE " + path + " " + f.getChannels()
                + " " + (int) f.getSampleRate() + " " + (buf.length / 2));
            StringBuilder sb = new StringBuilder();
            for (int i = 0; i + 1 < buf.length; i += 2) {
                int lo = buf[i] & 255;
                int hi = buf[i + 1];
                sb.append((hi << 8) | lo).append('\n');
            }
            System.out.print(sb);
        }
    }
}
