// Multi-frame GIF reference (round 16): walks OpenJDK's GIFImageReader
// frame by frame — an independent LZW/palette/animation parse — and
// dumps "FRAME <index> <w> <h>" plus one "r g b a" quad per pixel per
// frame. The conformance tests use full-canvas frames, where the raw
// per-frame raster equals the composited output.
import java.awt.image.BufferedImage;
import java.io.File;
import java.util.Iterator;
import javax.imageio.ImageIO;
import javax.imageio.ImageReader;
import javax.imageio.stream.ImageInputStream;

public class GifDump {
    public static void main(String[] args) throws Exception {
        for (String path : args) {
            ImageInputStream in =
                ImageIO.createImageInputStream(new File(path));
            Iterator<ImageReader> it = ImageIO.getImageReaders(in);
            ImageReader reader = it.next();
            reader.setInput(in);
            for (int i = 0; ; i++) {
                BufferedImage img;
                try {
                    img = reader.read(i);
                } catch (IndexOutOfBoundsException e) {
                    break;
                }
                StringBuilder sb = new StringBuilder();
                sb.append("FRAME ").append(i).append(' ')
                  .append(img.getWidth()).append(' ')
                  .append(img.getHeight()).append('\n');
                for (int y = 0; y < img.getHeight(); y++) {
                    for (int x = 0; x < img.getWidth(); x++) {
                        int argb = img.getRGB(x, y);
                        sb.append((argb >> 16) & 255).append(' ')
                          .append((argb >> 8) & 255).append(' ')
                          .append(argb & 255).append(' ')
                          .append((argb >>> 24) & 255).append('\n');
                    }
                }
                System.out.print(sb);
            }
            reader.dispose();
        }
    }
}
